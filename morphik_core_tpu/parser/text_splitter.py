"""Recursive character text splitting.

Same contract as the reference's splitter (reference
core/parser/morphik_parser.py:39-107 and morphik_rust/src/chunking.rs:
separators ["\\n\\n", "\\n", ". ", " ", ""], chunk_size budget,
chunk_overlap carried between consecutive chunks)."""

from __future__ import annotations

from typing import List, Sequence


class RecursiveCharacterTextSplitter:
    def __init__(
        self,
        chunk_size: int = 6000,
        chunk_overlap: int = 300,
        separators: Sequence[str] = ("\n\n", "\n", ". ", " ", ""),
    ):
        if chunk_overlap >= chunk_size:
            raise ValueError("chunk_overlap must be smaller than chunk_size")
        self.chunk_size = chunk_size
        self.chunk_overlap = chunk_overlap
        self.separators = list(separators)

    def split_text(self, text: str) -> List[str]:
        if not text:
            return []
        if len(text) <= self.chunk_size:
            return [text]
        if self.separators == ["\n\n", "\n", ". ", " ", ""]:
            # default separators: the native C++ kernel handles ASCII
            # input (utils/fast_ops.py::native_split_text; parity-tested)
            from morphik_core_tpu.utils.fast_ops import native_split_text

            native = native_split_text(text, self.chunk_size, self.chunk_overlap)
            if native is not None:
                return native
        pieces = self._split(text, 0)
        return self._merge(pieces)

    def _split(self, text: str, sep_idx: int) -> List[str]:
        """Recursively split until every piece fits the budget."""
        if len(text) <= self.chunk_size:
            return [text]
        if sep_idx >= len(self.separators):
            return [text[i : i + self.chunk_size] for i in range(0, len(text), self.chunk_size)]
        sep = self.separators[sep_idx]
        if sep == "":
            return [text[i : i + self.chunk_size] for i in range(0, len(text), self.chunk_size)]
        parts = text.split(sep)
        out: List[str] = []
        for i, p in enumerate(parts):
            keep = p + sep if i < len(parts) - 1 else p
            if not keep:
                continue
            if len(keep) <= self.chunk_size:
                out.append(keep)
            else:
                out.extend(self._split(keep, sep_idx + 1))
        return out

    def _merge(self, pieces: List[str]) -> List[str]:
        """Greedy-pack pieces into chunks; start each new chunk with the
        overlap tail of the previous one. The tail is trimmed so
        tail+piece never exceeds chunk_size (pieces are <= chunk_size by
        construction, so every emitted chunk honors the budget)."""
        chunks: List[str] = []
        cur = ""
        for p in pieces:
            if cur and len(cur) + len(p) > self.chunk_size:
                chunks.append(cur)
                keep = min(self.chunk_overlap, max(0, self.chunk_size - len(p)))
                cur = cur[len(cur) - keep :] if keep else ""
            cur += p
        if cur.strip():
            chunks.append(cur)
        return chunks
