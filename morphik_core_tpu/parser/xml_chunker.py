"""Schema-agnostic hierarchical XML chunking with breadcrumbs.

Behavioral model: reference core/parser/xml_chunker.py:26-368 — walk the
element tree, emit chunks at configurable "unit" tags (or any element
whose text fits the token budget), each chunk prefixed with its
breadcrumb path, oversized units recursively split."""

from __future__ import annotations

import logging
import re
import xml.etree.ElementTree as ET
from typing import Any, Dict, List, Optional, Sequence

from morphik_core_tpu.parser.text_splitter import RecursiveCharacterTextSplitter

logger = logging.getLogger(__name__)


def _approx_tokens(text: str) -> int:
    # chars/4 heuristic (reference limits_utils.py:52-57 uses the same idea)
    return max(1, len(text) // 4)


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


class XMLChunker:
    def __init__(
        self,
        max_tokens: int = 350,
        unit_tags: Optional[Sequence[str]] = None,
        breadcrumb_attrs: Sequence[str] = ("id", "name", "title", "label"),
    ):
        self.max_tokens = max_tokens
        self.unit_tags = set(unit_tags or ("section", "article", "chapter", "item", "entry", "record", "clause"))
        self.breadcrumb_attrs = breadcrumb_attrs

    def chunk(self, xml_text: str) -> List[Dict[str, Any]]:
        """-> [{"content", "breadcrumbs", "tag", "attrs"}]"""
        xml_text = re.sub(r"^\s*<\?xml[^>]*\?>", "", xml_text.strip())
        try:
            root = ET.fromstring(xml_text)
        except ET.ParseError:
            try:
                root = ET.fromstring(f"<root>{xml_text}</root>")
            except ET.ParseError as e:
                logger.warning("XML parse failed (%s); falling back to text split", e)
                splitter = RecursiveCharacterTextSplitter(self.max_tokens * 4, 0)
                return [
                    {"content": c, "breadcrumbs": [], "tag": "text", "attrs": {}}
                    for c in splitter.split_text(xml_text)
                ]
        chunks: List[Dict[str, Any]] = []
        self._walk(root, [], chunks)
        return chunks

    def _crumb(self, el: ET.Element) -> str:
        label = _localname(el.tag)
        for attr in self.breadcrumb_attrs:
            if attr in el.attrib:
                return f"{label}[{el.attrib[attr]}]"
        return label

    def _text_of(self, el: ET.Element) -> str:
        return " ".join(t.strip() for t in el.itertext() if t.strip())

    def _walk(self, el: ET.Element, crumbs: List[str], out: List[Dict[str, Any]]) -> None:
        text = self._text_of(el)
        if not text:
            return
        is_unit = _localname(el.tag).lower() in self.unit_tags
        fits = _approx_tokens(text) <= self.max_tokens
        has_element_children = any(True for _ in el)

        if (is_unit or not has_element_children) and fits:
            out.append(self._emit(el, crumbs, text))
            return
        if not has_element_children:  # leaf too big: split
            splitter = RecursiveCharacterTextSplitter(self.max_tokens * 4, 40)
            for part in splitter.split_text(text):
                out.append(self._emit(el, crumbs, part))
            return
        # descend; capture any direct text of this element as its own chunk
        own = (el.text or "").strip()
        if own:
            out.append(self._emit(el, crumbs, own))
        child_crumbs = crumbs + [self._crumb(el)]
        for child in el:
            self._walk(child, child_crumbs, out)

    def _emit(self, el: ET.Element, crumbs: List[str], text: str) -> Dict[str, Any]:
        breadcrumbs = crumbs + [self._crumb(el)]
        prefix = " > ".join(breadcrumbs)
        return {
            "content": f"[{prefix}] {text}" if prefix else text,
            "breadcrumbs": breadcrumbs,
            "tag": _localname(el.tag),
            "attrs": dict(el.attrib),
        }
