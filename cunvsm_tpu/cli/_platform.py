"""Shared --platform handling for the CLIs.

The sandbox/deployment environment may pre-pin jax to a remote TPU backend
(sitecustomize sets JAX_PLATFORMS before any user code runs), so an env var
is too late and a dead accelerator tunnel makes the first ``jax.devices()``
hang indefinitely.  Every long-running CLI therefore takes ``--platform``
(like the scripts/ entry points) and applies it through ``jax.config``,
which still wins as long as no backend has been initialized.
"""

from __future__ import annotations


def add_platform_flag(parser) -> None:
    parser.add_argument(
        "--platform", default=None,
        help="jax platform override (e.g. 'cpu', 'tpu'); applied via "
             "jax.config before first device use — an environment pinned "
             "to an unreachable accelerator would otherwise hang on "
             "backend init.",
    )


def apply_platform(args) -> None:
    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)


def add_distributed_flags(parser) -> None:
    """Multi-process launch flags shared by the pod-capable entry points
    (cunvsm-train, rank_adhoc, e2e_throughput)."""
    parser.add_argument(
        "--distributed", action="store_true",
        help="Multi-process (multi-host) run: join the global device set "
             "via jax.distributed auto-detection (TPU pods) before any "
             "backend use.  For manual launches pass the "
             "--coordinator_address/--num_processes/--process_id triple "
             "instead.",
    )
    parser.add_argument(
        "--coordinator_address", default=None,
        help="host:port of process 0's coordinator (manual multi-process "
             "launch; implies --distributed).",
    )
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)


def apply_distributed(args) -> None:
    """Join the global device set if requested.  Call AFTER apply_platform
    (the platform override must be in place) and before any backend use."""
    if getattr(args, "distributed", False) or (
        getattr(args, "coordinator_address", None) is not None
    ):
        from cunvsm_tpu.parallel.distributed import initialize

        initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
