"""Pallas TPU kernels (see rank.py for the design notes)."""

from sahara_tpu.kernels.rank import occ16_vmem_bytes, pack_occ16, rank_all_vmem

__all__ = ["pack_occ16", "rank_all_vmem", "occ16_vmem_bytes"]
