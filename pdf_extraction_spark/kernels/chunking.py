"""Recursive separator-hierarchy chunking (the reference's RAG splitter,
complete_multimodal_rag_evaluation.py:33-48: RecursiveCharacterTextSplitter
with chunk_size=1200, overlap=200, separators ``## > ### > #### > \\n\\n >
\\n > ". " > " " > ""``).

Deterministic offset-based rebuild: split the document into atomic spans at
the highest-priority separator present (recursing with lower-priority
separators into any piece still over the size), then greedily pack atoms
into chunks with a bounded-overlap carry-back. Every chunk is a contiguous
``text[start:end]`` substring, at most ``size`` chars, and consecutive
chunks overlap by at most ``overlap`` chars — invariants the driver oracle
checks corpus-wide.
"""

from __future__ import annotations

CHUNK_SIZE = 1200
CHUNK_OVERLAP = 200
SEPARATORS = ("##", "###", "####", "\n\n", "\n", ". ", " ", "")


def _split_spans(text: str, lo: int, hi: int, seps: tuple[str, ...],
                 size: int) -> list[tuple[int, int]]:
    """Atomic spans of ``text[lo:hi]``, each at most ``size`` chars, split at
    the first separator in ``seps`` that occurs; the separator stays attached
    to the preceding piece (boundary after the separator)."""
    if hi - lo <= size:
        return [(lo, hi)]
    for k, sep in enumerate(seps):
        if sep == "":
            return [(i, min(i + size, hi)) for i in range(lo, hi, size)]
        bounds = []
        start = lo
        while True:
            i = text.find(sep, start, hi)
            if i == -1:
                break
            b = i + len(sep)
            if lo < b < hi:
                bounds.append(b)
            start = i + 1
        if not bounds:
            continue
        edges = [lo] + bounds + [hi]
        out: list[tuple[int, int]] = []
        for a, b in zip(edges, edges[1:]):
            if b - a <= size:
                out.append((a, b))
            else:
                out.extend(_split_spans(text, a, b, seps[k + 1:], size))
        return out
    return [(lo, hi)]


def recursive_chunks(
    text: str,
    size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
    seps: tuple[str, ...] = SEPARATORS,
) -> list[tuple[int, int]]:
    """Chunk ``text`` into (start, end) offset pairs.

    Greedy packing: extend a chunk while the next atom still fits in
    ``size``; the following chunk carries back whole atoms from the tail as
    long as they fit inside ``overlap`` chars of the boundary."""
    n = len(text)
    if n == 0:
        return []
    atoms = _split_spans(text, 0, n, seps, size)
    chunks: list[tuple[int, int]] = []
    i = 0
    m = len(atoms)
    while i < m:
        j = i
        while j + 1 < m and atoms[j + 1][1] - atoms[i][0] <= size:
            j += 1
        chunks.append((atoms[i][0], atoms[j][1]))
        if j + 1 >= m:
            break
        k = j + 1
        # carry back only while the next unseen atom still fits in the new
        # chunk — otherwise the new chunk would close at the SAME end as the
        # previous one (a fully-contained duplicate chunk: carried-back tail
        # + an almost-size atom exceeded `size`, review-confirmed repro)
        while (k - 1 > i and chunks[-1][1] - atoms[k - 1][0] <= overlap
               and atoms[j + 1][1] - atoms[k - 1][0] <= size):
            k -= 1
        i = k
    return chunks
