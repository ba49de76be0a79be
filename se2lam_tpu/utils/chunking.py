"""Host-side chunk-feed plumbing shared by the speculative chunked
paths (`SlamSystem.process_chunk`, `Localizer.process_chunk`)."""
from __future__ import annotations

__all__ = ["pad_chunk"]


def pad_chunk(owner, imgs, odos, idx):
    """Pad a chunk tail to ONE compiled size, growing monotonically.

    Every distinct array length is a separate multi-minute XLA compile
    on the real chip; the chunk scans' [start, stop) masking makes
    padded steps free, so short chunks (bootstrap-shortened first chunk,
    feed tail) are padded with the last frame up to the largest size
    this ``owner`` has seen (tracked on ``owner._chunk_klen``).

    Returns (kk, pad, imgs_fed, odos_fed) where ``kk`` is the number of
    live steps and ``len(imgs_fed) == kk + pad``.
    """
    kk = len(imgs) - idx
    owner._chunk_klen = max(getattr(owner, "_chunk_klen", 0), kk)
    pad = owner._chunk_klen - kk
    imgs_fed = list(imgs[idx:]) + [imgs[-1]] * pad
    odos_fed = list(odos[idx:]) + [odos[-1]] * pad
    return kk, pad, imgs_fed, odos_fed
