"""Pure-Python per-document PDF parsing kernel (no Spark imports here).

One document never crosses a partition boundary mid-parse; the kernel is
invoked per row inside an Arrow batch (SURVEY.md §1.1 "row- vs
column-orientation"). Vectorization amortizes serialization at the Arrow
boundary, not the inner parse.
"""
