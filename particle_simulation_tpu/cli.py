"""Command-line driver with the reference's 8-argument positional contract.

Reference (run:1-9, src/main.cu:8-47):
    main MODE VERBOSE INIT_N MAX_T BLOCK_SIZE MAX_N SLEEP_TIME POISSON_TS
with MODE in {bench, 30 (Dynamic), 31 (CPU Sync), 32 (Naive),
33 (Dynamic Old), test}.

Usage:  python -m particle_simulation_tpu 30 0 1000000 10 256 50000000 100 100
Extra keyword-style overrides (grid=, cs=, seed=, precision=) are accepted
after the positional args — a new-framework extension.
"""

from __future__ import annotations

import sys
import time

from .config import SCHEDULER_MODES, SimConfig

_CKPT_DIR = None


def parse_args(argv) -> tuple[str, SimConfig]:
    mode = argv[0]
    cfg = SimConfig()
    if len(argv) >= 8:
        cfg = cfg.replace(
            verbose=int(argv[1]),
            init_n=int(argv[2]),
            poisson_steps=int(argv[3]),
            block_size=int(argv[4]),
            capacity=int(argv[5]),
            sleep_time_ns=int(argv[6]),
            poisson_timestep=int(argv[7]),
        )
    for extra in argv[8:]:
        key, _, val = extra.partition("=")
        if key == "grid":
            g = int(val)
            cfg = cfg.replace(grid_size=(g, g, g))
        elif key == "cs":
            cfg = cfg.replace(cross_section_path=val)
        elif key == "seed":
            cfg = cfg.replace(seed=int(val))
        elif key == "precision":
            cfg = cfg.replace(precision=val)
            if val == "f64":
                import jax

                jax.config.update("jax_enable_x64", True)
        elif key == "field":
            cfg = cfg.replace(field_model=val)
        elif key == "ckpt":
            global _CKPT_DIR
            _CKPT_DIR = val
        elif key == "platform":
            import jax

            jax.config.update("jax_platforms", val)
        else:
            raise SystemExit(f"unknown override {extra!r}")
    if mode in SCHEDULER_MODES:
        cfg = cfg.replace(scheduler=SCHEDULER_MODES[mode])
    return mode, cfg


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(__doc__)
        return 2
    start = time.perf_counter()
    mode, cfg = parse_args(argv)

    if mode == "bench":
        from .benchmarks import run_benchmark

        run_benchmark()
    elif mode in SCHEDULER_MODES:
        from .observability import make_log_hook
        from .runtime import run_pic

        hook = make_log_hook(cfg)
        if _CKPT_DIR:
            from .checkpoint import make_checkpoint_hook

            ckpt_hook = make_checkpoint_hook(cfg, _CKPT_DIR)
            log_hook = hook

            def hook(t, state):
                log_hook(t, state)
                ckpt_hook(t, state)

            if not cfg.verbose:
                cfg = cfg.replace(verbose=1)
        run_pic(cfg, on_step=hook)
    elif mode == "test":
        from .testing import run_unit_test

        ok = run_unit_test(cfg)
        if not ok:
            return 1
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    print(f"CPU time of program: {(time.perf_counter() - start) * 1e3:.3f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
