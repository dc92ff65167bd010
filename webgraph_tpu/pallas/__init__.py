"""Pallas (Mosaic) TPU kernels: the in-kernel BVGraph decoder.

This package holds the device-kernel path of the framework: the whole
decode work-queue runs *inside* one Mosaic kernel (bitstream window in
VMEM, lane-parallel variable-length-code decode, in-kernel reference-chain
merge), eliminating the per-op XLA dispatch overhead that bounds the
``formats/bvgraph_jax.py`` path (PERF.md §1-3).

Modules:
  * :mod:`pcodes` — in-kernel instantaneous-code readers (γ/δ/ζ_k/unary/
    Golomb/nibble/minimal-binary) over a replicated VMEM word table.
  * :mod:`decode` — the blocked decode kernel + host partitioner.
"""
