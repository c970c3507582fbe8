"""Schema-agnostic hierarchical XML chunking with breadcrumbs.

Behavioral model: reference core/parser/xml_chunker.py:26-368 — profile
the tag frequencies, auto-select a document "unit" tag (preferred list,
then the 2..50-occurrence heuristic, xml_chunker.py:76-104), walk the
element tree skipping ignore_tags subtrees (TOC/INDEX), emit chunks at
unit tags (or any element whose text fits the token budget), each chunk
prefixed with its breadcrumb path (attribute ids, else a first-words
xml id, :130-144), oversized units recursively split sentence-first.
Token counting uses tiktoken when importable, else whitespace counts
(:58-67)."""

from __future__ import annotations

import logging
import re
import xml.etree.ElementTree as ET
from collections import Counter
from typing import Any, Dict, List, Optional, Sequence

from morphik_core_tpu.parser.text_splitter import RecursiveCharacterTextSplitter

logger = logging.getLogger(__name__)

try:  # optional, like the reference
    import tiktoken

    _ENC = tiktoken.get_encoding("cl100k_base")
except Exception:  # noqa: BLE001 — absent or failed download
    _ENC = None


def _count_tokens(text: str) -> int:
    if _ENC is not None:
        return len(_ENC.encode(text))
    return max(1, len(text.split()))


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


class XMLChunker:
    def __init__(
        self,
        max_tokens: int = 350,
        unit_tags: Optional[Sequence[str]] = None,
        ignore_tags: Sequence[str] = ("toc", "index"),
        breadcrumb_attrs: Sequence[str] = ("id", "name", "title", "label"),
    ):
        self.max_tokens = max_tokens
        self.unit_tags = set(unit_tags or ("section", "article", "chapter", "item", "entry", "record", "clause"))
        self.ignore_tags = {t.lower() for t in ignore_tags}
        self.breadcrumb_attrs = breadcrumb_attrs

    # -- unit-tag auto-selection (reference _profile_tree/_choose_unit_tag)

    def _auto_unit_tag(self, root: ET.Element) -> Optional[str]:
        """Pick a repeating structural tag to treat as a chunk unit when
        the document's schema doesn't use any of the preferred names."""
        profile: Counter = Counter()

        def visit(el: ET.Element) -> None:
            name = _localname(el.tag).lower()
            if name in self.ignore_tags:  # skip the whole subtree
                return
            profile[name] += 1
            for child in el:
                visit(child)

        visit(root)
        if any(t in profile for t in self.unit_tags):
            return None  # preferred tags exist; no auto pick needed
        for tag, count in sorted(profile.items(), key=lambda x: x[1]):
            # reasonable repetition: a structural unit, not a formatting tag
            if 2 <= count <= 50 and tag != _localname(root.tag).lower():
                logger.debug("auto-selected XML unit tag %r (count %d)", tag, count)
                return tag
        return None

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
        auto = self._auto_unit_tag(root)
        units = self.unit_tags | ({auto} if auto else set())
        self._walk(root, [], chunks, units)
        return chunks

    def _crumb(self, el: ET.Element, is_unit: bool = False) -> str:
        label = _localname(el.tag)
        for attr in self.breadcrumb_attrs:
            if attr in el.attrib:
                return f"{label}[{el.attrib[attr]}]"
        # xml:id then first-words identifier for unit elements
        # (reference _best_xml_id, xml_chunker.py:130-144)
        for attr in ("{http://www.w3.org/XML/1998/namespace}id", "ID"):
            if attr in el.attrib:
                return f"{label}[{el.attrib[attr]}]"
        if is_unit:
            words = self._text_of(el).split()[:3]
            if words:
                return f"{label}[{'_'.join(words)[:40]}]"
        return label

    def _text_of(self, el: ET.Element) -> str:
        return " ".join(t.strip() for t in el.itertext() if t.strip())

    def _walk(
        self, el: ET.Element, crumbs: List[str], out: List[Dict[str, Any]], units: set
    ) -> None:
        name = _localname(el.tag).lower()
        if name in self.ignore_tags:  # TOC/INDEX subtrees add noise, skip
            return
        text = self._text_of(el)
        if not text:
            return
        is_unit = name in units
        fits = _count_tokens(text) <= self.max_tokens
        has_element_children = any(True for _ in el)

        if (is_unit or not has_element_children) and fits:
            out.append(self._emit(el, crumbs, text, is_unit))
            return
        if not has_element_children:  # leaf too big: sentence-first split
            splitter = RecursiveCharacterTextSplitter(self.max_tokens * 4, 40)
            for part in splitter.split_text(text):
                out.append(self._emit(el, crumbs, part, is_unit))
            return
        # descend; capture any direct text of this element as its own chunk
        own = (el.text or "").strip()
        if own:
            out.append(self._emit(el, crumbs, own, is_unit))
        child_crumbs = crumbs + [self._crumb(el, is_unit)]
        for child in el:
            self._walk(child, child_crumbs, out, units)
            # mixed content: text BETWEEN/AFTER child elements belongs to
            # this element, and child subtree walks never see it
            tail = (child.tail or "").strip()
            if tail:
                out.append(self._emit(el, crumbs, tail, is_unit))

    def _emit(self, el: ET.Element, crumbs: List[str], text: str, is_unit: bool = False) -> Dict[str, Any]:
        breadcrumbs = crumbs + [self._crumb(el, is_unit)]
        prefix = " > ".join(breadcrumbs)
        return {
            "content": f"[{prefix}] {text}" if prefix else text,
            "breadcrumbs": breadcrumbs,
            "tag": _localname(el.tag),
            "attrs": dict(el.attrib),
        }
