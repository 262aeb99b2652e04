"""Stroke-mask -> stroke-id extraction (DETR-style postprocess).

Reference: utils/postprocessing.py:92-152. Vectorized numpy; no torch.
"""
from __future__ import annotations

import numpy as np


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def process_pred_stroke_masks_to_stroke_ids(
    pred_stroke_masks: np.ndarray,
    confidence_scores: np.ndarray,
    confidence_threshold: float = 0.5,
) -> np.ndarray:
    """Assign a stroke id to every predicted segment.

    1. sigmoid masks + confidences; zero out masks whose confidence is
       below threshold (reference utils/postprocessing.py:126-131)
    2. per-segment argmax over masks
    3. re-number the surviving mask ids contiguously from 0

    Returns (B, out_segments) float array of contiguous stroke ids.
    """
    assert pred_stroke_masks.ndim == 3 and confidence_scores.ndim == 2
    probs = _sigmoid(np.asarray(pred_stroke_masks, dtype=np.float64))
    conf = _sigmoid(np.asarray(confidence_scores, dtype=np.float64))
    probs = np.where((conf >= confidence_threshold)[:, :, None], probs, 0.0)

    B, _, out_segments = probs.shape
    stroke_ids = np.full((B, out_segments), -1.0)
    assoc = probs.argmax(axis=1)  # (B, out_segments)
    for b in range(B):
        for i, mask_id in enumerate(np.unique(assoc[b])):
            stroke_ids[b, assoc[b] == mask_id] = i
    return stroke_ids


def handle_end_of_sequence(sequence, confidence_logits, threshold):
    """Truncate a sequence at the first low-confidence vector
    (reference utils/postprocessing.py:77-90)."""
    high = np.asarray(confidence_logits) > threshold
    if np.all(high):
        return sequence
    return sequence[: int(np.argmin(high))]
