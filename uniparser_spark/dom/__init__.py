from .html import HtmlElement, parse_html
from .xml import XmlElement, parse_xml

__all__ = ["HtmlElement", "parse_html", "XmlElement", "parse_xml"]
