"""CLI alias: `python -m declip_tpu.solver.filip_solver --config ...` —
mirrors the reference's per-method entry point
(prototype/solver/filip_solver.py). The generic Solver dispatches on the
model type, so all aliases share one engine."""

from declip_tpu.solver import main

if __name__ == "__main__":
    main()
