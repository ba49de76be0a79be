"""Async device→host copy hint shared by the pipelined feed paths."""
from __future__ import annotations

__all__ = ["host_prefetch"]


def host_prefetch(*arrays):
    """Start async device→host copies for values destined to ride a
    future control pull. Purely a performance hint — a later
    ``device_get`` is correct (just slower) without it. Measured over
    the axon tunnel: a scalar fetched ~35 ms after its async copy costs
    ~0.3 ms instead of the ~50 ms synchronous RTT (docs/DESIGN.md §18);
    even a back-to-back copy+get halves the synchronous get."""
    for a in arrays:
        f = getattr(a, "copy_to_host_async", None)
        if f is not None:
            try:
                f()
            except Exception:
                pass
