"""Per-activation batch normalization matching the reference's cuDNN usage.

The reference (cudnn_utils.cu:49-183) calls cuDNN's PER_ACTIVATION batch norm
with these quirks that make stock flax/optax BN *not* equivalent:

* gamma is allocated trainable-shaped but frozen at 1.0 (filled at
  cudnn_utils.cu:68; grad_gamma is computed into a scratch buffer and never
  applied).
* the transform's *bias* parameter plays the role of BN's beta
  (params.cu:393-428 passes ``bias_`` as bnBias), so the bias gradient is
  BN's beta gradient (= sum of upstream grads over the batch).
* training-mode statistics only, biased variance (1/N), epsilon 1e-4; no
  running averages are kept (exponential_average_factor=1 with null running
  stats, cudnn_utils.cu:119-124).

Autodiff through this expression reproduces cuDNN's BatchNormalizationBackward
for the data and beta gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_norm_train(x: jax.Array, beta: jax.Array, eps: float) -> jax.Array:
    """Normalize over the batch axis (axis 0) per feature; add beta.

    x: [batch, features]; beta: [features].
    """
    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=0, keepdims=True)
    inv_std = jax.lax.rsqrt(var + eps)
    return (x - mean) * inv_std + beta[None, :]
