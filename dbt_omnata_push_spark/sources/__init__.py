from .files import read_source, write_sink, SUPPORTED_FORMATS

__all__ = ["read_source", "write_sink", "SUPPORTED_FORMATS"]
