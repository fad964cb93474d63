"""Throughput benchmark: 512x512 stylized images/sec/chip.

Runs the flagship EnhancedGenerator (deployed config: channels=16, one
transformer block — enhanced_train.py:18) as a batched, jitted
uint8-in/uint8-out inference pipeline and prints ONE JSON line.

Besides the headline device metric the JSON line carries:
- ``end_to_end``: the REAL folder pipeline — JPEG bytes on disk -> decode ->
  stylize -> aspect-restore -> encoded output on disk (the
  batch_process_images.py path, native libjpeg-turbo host I/O) at BOTH the
  256^2 batch-CLI canvas and the 512^2 headline canvas, each with the
  device-only rate, the measured tunnel-transfer bounds for that canvas
  (``transfer_floor_img_s`` = no-overlap serial sum,
  ``transfer_ceiling_img_s`` = full-overlap, slower-direction bound — the
  directions multiplex per scripts/ab_transfer_overlap.py), and the
  fraction of the overlap-aware ceiling reached (<= 1.0 by construction).
- ``mfu`` / ``hbm_util``: achieved FLOPs/s and HBM bytes/s of the headline
  512^2 program against v5e peaks (197 TFLOP/s bf16, 819 GB/s), from XLA's
  compiled cost analysis + the measured wall time.

Method notes:
- distinct input batches every iteration (defeats any result caching),
- iterations dispatch back-to-back; timing brackets the chain and fetches a
  sliver of the last output (block_until_ready does not actually block on
  this tunnel backend; the per-call RTT ~45ms amortizes away, matching how
  the batch pipeline drives the TPU),
- bf16 activations (fp32 weights auto-cast) — the TPU-native precision,
- tries the fused Pallas window-attention fast path first and falls back to
  the pure-XLA formulation if the remote kernel compiler rejects it (the
  compile service 500s sporadically).

Baseline context (BASELINE.json): north-star >1000 img/s at 512^2 on a
v5e-8 => 125 img/s/chip. vs_baseline = measured imgs/sec/chip / 125.
The reference processes images serially at batch=1 with per-image host
round-trips (batch_process_images.py:498-536).
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

SIZE = 512
BATCH = 128  # batch-size sweep (post C=32-einsum dispatch): 375 img/s @96,
             # 410 @128, 341 @160, 373 @192; 128 is the sweet spot
ITERS = 6
BASELINE_PER_CHIP = 1000.0 / 8.0
# (batch, fast_attention), best first — shared by main() and prewarm()
CANDIDATES = [(BATCH, True), (96, True), (96, False), (32, True),
              (32, False)]

# v5e (TPU v5 lite) single-chip peaks: 197 TFLOP/s bf16, 819 GB/s HBM.
PEAK_FLOPS = 197e12
PEAK_HBM = 819e9

END_TO_END_N = 256        # folder size for the end-to-end run
END_TO_END_SRC = 512      # source JPEG long side (realistic photo inputs)


# Measured head-to-head twice on the flagship pipeline: 1.023x / 1.022x
# over base (scripts/ab_xla_flags.py — per-compile compiler_options; the
# XLA_FLAGS env route fatals in the client-side CPU jaxlib).
COMPILER_OPTS = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def _build_pipeline(fast_attention: bool, probe=None):
    """Returns (params, callable). With a probe batch, pre-compiles for
    that shape with COMPILER_OPTS (falling back to the plain jit on any
    failure); without one, returns the plain jit (shape-generic)."""
    from multi_style_transfer_gan_tpu.models import (
        enhanced_generator_apply, enhanced_generator_init,
    )
    from multi_style_transfer_gan_tpu.ops import (
        to_model_range, from_model_range,
    )

    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=16,
                                     num_transformer_blocks=1)

    @jax.jit
    def pipeline(params, imgs_u8):
        x = to_model_range(imgs_u8).astype(jnp.bfloat16)
        y = enhanced_generator_apply(params, x, fast_attention=fast_attention)
        return (from_model_range(y.astype(jnp.float32)) * 255.0
                ).astype(jnp.uint8)

    if probe is not None:
        try:
            compiled = pipeline.lower(params, probe).compile(
                compiler_options=COMPILER_OPTS)
            return params, compiled
        except Exception as e:
            print(f"# compiler_options compile failed ({str(e)[:80]}); "
                  "plain jit", flush=True)
    return params, pipeline


def prewarm():
    """Compile every candidate pipeline into the persistent cache so a later
    bench run (e.g. the driver's, during a compile-service brownout) never
    has to fall back below the best variant. Run whenever the service is up:
    ``python bench.py --prewarm``."""
    from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    for bs, fast in CANDIDATES:
        probe = jax.device_put(rng.integers(0, 256, (bs, SIZE, SIZE, 3),
                                            dtype=np.uint8))
        params, candidate = _build_pipeline(fast, probe)
        try:
            t0 = time.perf_counter()
            _ = np.asarray(candidate(params, probe)[0, :1, :1])
            print(f"# prewarmed fast={fast} batch={bs} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
        except Exception as e:
            print(f"# prewarm fast={fast} batch={bs} FAILED: "
                  f"{str(e)[:120]}", flush=True)


def main():
    from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    rng = np.random.default_rng(0)

    # Multi-chip hosts: shard the batch over a 1-D data mesh so the timed
    # loop exercises every chip and the per-chip division below is honest
    # (single-device placement would bench one chip but divide by all).
    n_chips = max(1, len(jax.devices()))
    sharding = None
    if n_chips > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(jax.devices()), ("data",))
        sharding = NamedSharding(mesh, P("data", None, None, None))

    def _put(arr):
        return jax.device_put(arr, sharding) if sharding is not None \
            else jax.device_put(arr)

    # The remote compile service 500s transiently under load — sometimes for
    # minutes at a stretch. Candidates are ordered best-first; retry in waves
    # with a sleep between them so a transient outage doesn't silently bench
    # a slow fallback, and stop as soon as the best candidate of any wave
    # compiles (cached compiles survive outages, so a warm cache short-
    # circuits all of this). Probes use ONE batch per candidate; the full
    # ITERS set is only allocated for the winner.
    probes = {}  # bs -> one device batch

    def probe_for(bs):
        if bs not in probes:
            probes[bs] = _put(rng.integers(0, 256, (bs, SIZE, SIZE, 3),
                                           dtype=np.uint8))
        return probes[bs]

    # best = lowest candidate index that has compiled so far; a later wave
    # can only upgrade it (retrying transient failures must never downgrade
    # an already-compiled better candidate).
    pipeline, batch_size, params, best_i = None, None, None, len(CANDIDATES)
    for wave in range(4):
        for i, (bs, fast) in enumerate(CANDIDATES):
            if i >= best_i:
                break
            try:  # _build_pipeline inside the try: init compiles remotely too
                p, candidate = _build_pipeline(fast, probe_for(bs))
                _ = np.asarray(candidate(p, probe_for(bs))[0, :1, :1])
                pipeline, batch_size, params, best_i = candidate, bs, p, i
                break
            except Exception as e:
                print(f"# wave{wave} fast_attention={fast} batch={bs}: "
                      f"{str(e)[:120]}", flush=True)
        if best_i == 0:
            break
        if wave < 3:
            time.sleep(45)  # let the compile service recover, then re-probe
    if pipeline is None:
        raise SystemExit("no pipeline compiled")
    for bs in list(probes):
        if bs != batch_size:
            del probes[bs]  # free the losing candidates' device buffers
    batches = [probes[batch_size]] + [
        _put(rng.integers(0, 256, (batch_size, SIZE, SIZE, 3),
                          dtype=np.uint8)) for _ in range(ITERS - 1)]

    # The deployment TPU is time-shared and its delivered throughput swings
    # several-fold between moments; min over several rounds reports the
    # chip's actual capability rather than a contended window.
    best = float("inf")
    for _ in range(5):
        outs = [pipeline(params, b) for b in batches]
        # Drain the warmup dispatches BEFORE starting the clock — async
        # dispatch means un-synced warmup work would otherwise execute
        # inside the timed region and halve the measured throughput.
        _ = np.asarray(outs[-1][:, -1, -1, :])
        t0 = time.perf_counter()
        outs = [pipeline(params, b) for b in batches]
        _ = np.asarray(outs[-1][:, -1, -1, :])
        best = min(best, time.perf_counter() - t0)

    per_chip = batch_size * ITERS / best / n_chips

    # --- MFU / HBM roofline of the headline program (VERDICT item 3) ------
    mfu = hbm_util = None
    try:
        if hasattr(pipeline, "cost_analysis"):  # pre-compiled executable
            ca = pipeline.cost_analysis()
        else:
            ca = jax.jit(lambda p, b: pipeline(p, b)).lower(
                params, batches[0]).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bytes_acc = float(ca.get("bytes accessed", 0.0))
        t_batch = best / ITERS  # seconds per dispatched batch
        if flops > 0:
            mfu = round(flops / t_batch / PEAK_FLOPS / n_chips, 4)
        if bytes_acc > 0:
            hbm_util = round(bytes_acc / t_batch / PEAK_HBM / n_chips, 4)
    except Exception as e:
        print(f"# cost_analysis unavailable: {str(e)[:100]}", flush=True)

    e2e = None
    try:
        transfer = measure_transfer()
        e2e = {"transfer": transfer}
        for canvas in (256, 512):  # 256 = the batch CLI's native canvas,
            e2e[f"canvas{canvas}"] = end_to_end(   # 512 = the headline res
                canvas, transfer=transfer)
    except Exception as e:
        print(f"# end_to_end failed: {str(e)[:160]}", flush=True)

    print(json.dumps({
        "metric": "512x512 stylized images/sec/chip (EnhancedGenerator c16, bf16)",
        "value": round(per_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(per_chip / BASELINE_PER_CHIP, 3),
        "mfu": mfu,
        "hbm_util": hbm_util,
        "end_to_end": e2e,
    }))


def measure_transfer(mb=12.0, rounds=3):
    """Measured tunnel H2D / D2H rates (MB/s) for the ceiling computation.

    On this deployment the chip sits behind an HTTP tunnel measuring
    ~20-42 MB/s H2D / ~18-20 MB/s D2H per direction; the round-3 re-measure
    (scripts/ab_transfer_overlap.py: serial 8.0 s vs concurrent 3.3 s)
    showed the two directions DO multiplex, so the full-overlap ceiling is
    set by the slower direction and the serial sum is only a floor — both
    are reported below."""
    nbytes = int(mb * 1e6)
    n_imgs = nbytes // (256 * 256 * 3)
    rng = np.random.default_rng(1)
    h2d = d2h = 0.0
    for _ in range(rounds):
        batch = rng.integers(0, 256, (n_imgs, 256, 256, 3), dtype=np.uint8)
        t0 = time.perf_counter()
        dev = jax.device_put(batch)
        _ = np.asarray(dev[0, :1, :1])  # sync the transfer
        h2d = max(h2d, batch.nbytes / (time.perf_counter() - t0))
        t0 = time.perf_counter()
        _ = np.asarray(dev)
        d2h = max(d2h, batch.nbytes / (time.perf_counter() - t0))
        dev.delete()
    return {"h2d_mb_s": round(h2d / 1e6, 1), "d2h_mb_s": round(d2h / 1e6, 1)}


def end_to_end(canvas=256, transfer=None):
    """The REAL folder pipeline: JPEG bytes on disk -> stylized, encoded
    files on disk (batch_process_images.py path) at the given canvas, plus
    the device-only rate of the same compiled program for the host-bound
    ratio and the tunnel-transfer ceiling for this canvas.

    This host has ONE core (nproc=1): the end-to-end rate is bounded by host
    JPEG decode+encode throughput, not the device (scripts/ab_host_io.py
    measures the host roofline; docs/PERFORMANCE.md discusses scaling on
    multi-core hosts, where the native loader's threads spread the I/O)."""
    import tempfile

    from scripts.ab_host_io import make_folder
    from multi_style_transfer_gan_tpu.models import (
        enhanced_generator_init, enhanced_generator_apply,
    )
    from multi_style_transfer_gan_tpu.pipelines.model_loader import LoadedModel
    from multi_style_transfer_gan_tpu.pipelines.batch import batch_process

    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=16,
                                     num_transformer_blocks=1)
    model = LoadedModel(kind="enhanced", channels=16, direction="AB",
                        params=params,
                        apply=lambda x: enhanced_generator_apply(params, x))

    # 512 canvas moves 4x the bytes per image through the ~25 MB/s tunnel;
    # half the folder keeps its runtime comparable to the 256 run.
    n_images = END_TO_END_N if canvas == 256 else END_TO_END_N // 2
    batch_size = 64 if canvas == 256 else 32
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in")
        os.makedirs(src)
        make_folder(src, n_images, END_TO_END_SRC)
        kwargs = dict(mode="cyclegan", batch_size=batch_size,
                      compute_dtype=jnp.bfloat16, fast_attention=True,
                      canvas=canvas)
        # run twice: first pays the jit, second is the measurement
        batch_process(model, src, os.path.join(td, "warm"), **kwargs)
        stats = batch_process(model, src, os.path.join(td, "out"), **kwargs)

        # device-only rate of the SAME program on pre-staged batches
        # (fast attention first, plain XLA if the kernel compile is
        # unavailable — mirrors batch_process's own fallback chain)
        from multi_style_transfer_gan_tpu.pipelines.batch import make_batch_fn

        rng = np.random.default_rng(0)
        dev_batches = [jax.device_put(
            rng.integers(0, 256, (batch_size, canvas, canvas, 3),
                         dtype=np.uint8)) for _ in range(4)]
        for fast in (True, False):
            try:
                run_fn = make_batch_fn(model, "cyclegan", "enhanced", 0.8,
                                       0.7, True, True,
                                       compute_dtype=jnp.bfloat16,
                                       fast_attention=fast)
                _ = np.asarray(run_fn(dev_batches[0])[0, :1, :1])
                break
            except Exception:
                if not fast:
                    raise
        best = float("inf")
        for _ in range(4):
            outs = [run_fn(b) for b in dev_batches]
            _ = np.asarray(outs[-1][:, -1, -1, :])  # drain warmup
            t0 = time.perf_counter()
            outs = [run_fn(b) for b in dev_batches]
            _ = np.asarray(outs[-1][:, -1, -1, :])
            best = min(best, time.perf_counter() - t0)
        device_only = batch_size * len(dev_batches) / best

    res = {
        "img_s": round(stats["imgs_per_sec"], 1),
        "device_only_img_s": round(device_only, 1),
        "host_bound_frac": round(
            1.0 - stats["imgs_per_sec"] / max(device_only, 1e-9), 3),
        "n_images": stats["processed"],
        "canvas": canvas,
        "host_cores": os.cpu_count(),
    }
    if transfer:
        # Every image crosses the tunnel twice (uint8 canvas in, uint8
        # canvas out). The directions multiplex (~2.4x aggregate,
        # scripts/ab_transfer_overlap.py), so:
        #   floor   = 1 / (bytes/h2d + bytes/d2h)   (no overlap at all)
        #   ceiling = 1 / max(bytes/h2d, bytes/d2h) (full overlap — set by
        #             the slower direction)
        # frac_of_ceiling is computed against the overlap-aware ceiling so
        # it stays <= 1.0 and interpretable without the docs.
        img_bytes = canvas * canvas * 3
        t_h2d = img_bytes / (transfer["h2d_mb_s"] * 1e6)
        t_d2h = img_bytes / (transfer["d2h_mb_s"] * 1e6)
        floor = 1.0 / (t_h2d + t_d2h)
        ceiling = 1.0 / max(t_h2d, t_d2h)
        res["transfer_floor_img_s"] = round(floor, 1)
        res["transfer_ceiling_img_s"] = round(ceiling, 1)
        res["frac_of_ceiling"] = round(stats["imgs_per_sec"] / ceiling, 3)
        # The round-5 overlap ablation (docs/PERFORMANCE.md "canvas-256
        # regression hunt") measured that pipeline-shaped bulk transfers
        # effectively SERIALIZE on this tunnel (chunked-D2H + H2D
        # concurrency recovers <17% of the smaller direction), so the
        # floor — not the full-overlap ceiling — is the operative bound;
        # frac_of_floor ~1.0 means the host pipeline is saturating it.
        res["frac_of_floor"] = round(stats["imgs_per_sec"] / floor, 3)
    return res


if __name__ == "__main__":
    import sys

    if "--prewarm" in sys.argv:
        prewarm()
    else:
        main()
