from .parser import Document, Node, parse_html, decode_entities  # noqa: F401
from .selectors import (  # noqa: F401
    SelectorIndex, compile_selector, query_all,
)
