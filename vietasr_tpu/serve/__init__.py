from vietasr_tpu.serve.app import AsrServer, serve

__all__ = ["AsrServer", "serve"]
