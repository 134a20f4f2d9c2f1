"""Pallas TPU kernels for the hot ops (window attention, deformable sampling).

Each kernel ships with a pure-jnp reference implementation in models/ and a
golden test in tests/test_kernels.py; config flags TPU.USE_PALLAS_* switch
between them.
"""
