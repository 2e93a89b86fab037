"""Deterministic fixture/source generators (seeded; no external data).

Analogue of the reference's golden test corpus (v.1/copies/readosm/tests/
testdata/test.osm: 1060 nodes / 112 ways / 13 relations) — small, frozen,
regenerable bit-for-bit from a seed.
"""
