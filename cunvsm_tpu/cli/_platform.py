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
