"""Pallas TPU kernels for the hot point-cloud ops.

Fused implementations of the sampling front-end (reference hot loop,
models/pointnet2_utils.py:65-109): the ball-query distance matrix never
leaves VMEM, and farthest point sampling runs its full iteration chain in
one kernel. Pure-XLA fallbacks are kept in ``ops.sampling``; the kernels
activate automatically on TPU backends.
"""
from .ball_query import ball_query_pallas
from .fps import fps_pallas

__all__ = ["ball_query_pallas", "fps_pallas"]
