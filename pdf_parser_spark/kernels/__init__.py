"""Pure-Python reference kernels (no Spark imports).

Each function reimplements, with identical regexes/thresholds/loop
order, a deterministic stage of the reference pipeline (cited per
function as ``reference: file:line``). These kernels are used both by
the golden-fixture generator and inside the Spark pandas UDFs, so
per-turn output equality is exact by construction — the Spark layer is
then responsible only for distribution (partitioning, ordering,
assembly), which the tests exercise separately.
"""
