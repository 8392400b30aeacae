"""Element hierarchy assignment (fills the reference's ``_build_hierarchy``
stub, advanced_layout_extractor.py:540-554).

The reference's LayoutElement carries ``hierarchy_level, parent_id,
children_ids`` (advanced_layout_extractor.py:65-79) but the builder was left
a TODO. The rebuilt rule is deterministic title-containment:

* ``title`` spans are roots (level 0, parent −1) and open a section;
* body spans (paragraph/table/figure/list) under the most recent title get
  level 1 with that title as parent; before any title they are roots;
* ``caption`` spans attach to the nearest table/figure span (backward
  preferred, else forward — captions can precede or follow their region in
  emission order) at that region's level + 1;
* ``header``/``footer`` are page chrome: always roots.

``children_ids`` is intentionally not materialized per row — it is the
relational inverse of ``parent_id`` (a groupBy away in the elements
DataFrame), and carrying arrays of child ids per row would denormalize what
Spark joins express directly.
"""

from __future__ import annotations

_REGION_KINDS = ("table", "figure")
_ROOT = (0, -1)


def assign_hierarchy(kinds: list[str]) -> list[tuple[int, int]]:
    """Per-span ``(hierarchy_level, parent_id)`` for a document's ordered
    element kinds. Pure and total: any kind string it doesn't know is
    treated as body content."""
    out: list[tuple[int, int]] = []
    last_title = -1
    for i, k in enumerate(kinds):
        if k == "title":
            out.append(_ROOT)
            last_title = i
        elif k in ("header", "footer"):
            out.append(_ROOT)
        elif k == "caption":
            region = _nearest_region(kinds, i)
            if region == -1:
                out.append(_ROOT if last_title == -1 else (1, last_title))
            else:
                # region level is known if it precedes the caption; a forward
                # region's level is what it WILL get from the same title scope
                region_level = (
                    out[region][0] if region < i else (0 if last_title == -1 else 1)
                )
                out.append((region_level + 1, region))
        else:
            out.append(_ROOT if last_title == -1 else (1, last_title))
    return out


def _nearest_region(kinds: list[str], i: int) -> int:
    for j in range(i - 1, -1, -1):
        if kinds[j] in _REGION_KINDS:
            return j
        if kinds[j] == "title":
            break  # don't attach across a section boundary
    for j in range(i + 1, len(kinds)):
        if kinds[j] in _REGION_KINDS:
            return j
        if kinds[j] == "title":
            break
    return -1
