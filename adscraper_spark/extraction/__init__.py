"""Extraction package. Re-exports are lazy (PEP 562) so pure-Python
consumers (corpus generator, oracle builder, simulator) can import
``extraction.core`` without dragging pyspark in via ``udfs``."""

_CORE = ("PageExtract", "extract_page", "normalize_text")
_UDFS = ("EXTRACT_SCHEMA", "extract_pages")

__all__ = [*_CORE, *_UDFS]


def __getattr__(name):
    if name in _CORE:
        from . import core
        return getattr(core, name)
    if name in _UDFS:
        from . import udfs
        return getattr(udfs, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
