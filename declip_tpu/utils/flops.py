"""Parameter census + FLOP estimates.

Rebuilds prototype/utils/misc.py:149-262 (count_params + conv FLOP hooks)
the XLA way: parameters are counted from the pytree; FLOPs come from the
compiler's own cost analysis of the jitted function instead of hand-written
per-module hooks.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax


def count_params(params) -> Dict[str, float]:
    leaves = jax.tree.leaves(params)
    total = sum(x.size for x in leaves)
    return {"total": total, "total_M": total / 1e6, "tensors": len(leaves)}


def count_params_by_top_module(params) -> Dict[str, int]:
    out: Dict[str, int] = {}
    for name, sub in params.items():
        out[name] = sum(
            x.size for x in jax.tree.leaves(sub)
        ) if isinstance(sub, dict) else sub.size
    return out


def estimate_flops(fn: Callable, *args, **kwargs) -> Optional[float]:
    """XLA cost-analysis FLOPs for one call of ``fn`` (None if the backend
    does not expose cost analysis)."""
    try:
        lowered = jax.jit(fn).lower(*args, **kwargs)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0)) or None
    except Exception:
        return None
