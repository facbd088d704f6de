from .core import PageExtract, extract_page, normalize_text  # noqa: F401
from .udfs import EXTRACT_SCHEMA, extract_pages  # noqa: F401
