"""Stream-scaling benchmark: frames/s vs number of concurrent streams.

BASELINE.md asks for >= 80 % frames/s scaling efficiency; the reference has
no multi-stream mode at all (its VideoFilter::stream is one stream,
reference Filters/VideoFilter.cpp:62-209), so this harness defines the
measurement for the TPU engine's two scale-out regimes:

  * default (real chip): S streams time-multiplexed on ONE device as a
    vmapped batch step — measures batching efficiency (how much of the
    S-fold work the chip absorbs by filling the MXU/VPU better).
    Efficiency(S) = t(1) * S / t(S): the throughput of the S-stream batch
    relative to running the same S streams back-to-back; 1.0 means batching
    is free, > 1.0 means the batch fills the chip better than one stream.
  * --mesh (virtual 8-CPU mesh): MultiStreamFilter with mesh {'stream': S},
    one stream per device — per-device work is constant, so ideal scaling
    keeps the per-STEP wall time flat.  Efficiency(S) = t_step(1)/t_step(S).
    This is the shape the driver's dryrun validates and what real multi-chip
    ICI would execute.  NOTE (r2->r3): virtual CPU devices share this host's
    2 physical cores, so wall time necessarily grows with S regardless of
    how the program is partitioned; run --mesh --control to measure that
    harness floor with a trivially-parallel workload and compare.

Emits one JSON line per S as soon as it's measured (stdout, flushed);
compile progress goes to stderr.  Wire LVK_COMPILE_CACHE (or rely on the
repo-default .cache/jax) to make repeat runs skip the multi-minute XLA
compiles.

Usage:
    python tools/bench_scaling.py [--mesh] [--control] [--size HxW]
                                  [--streams 1,2,4,8] [--json-out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", action="store_true",
                    help="virtual 8-CPU device mesh (one stream per device)")
    ap.add_argument("--control", action="store_true",
                    help="replace the stabilizer with a trivially-parallel "
                    "per-stream conv workload: measures the harness's own "
                    "scaling floor (host-core contention on virtual devices)")
    ap.add_argument("--size", default=None, help="HxW (default 1080x1920; "
                    "mesh mode defaults to 270x480 to keep CPU emulation fast)")
    ap.add_argument("--streams", default="1,2,4,8")
    ap.add_argument("--json-out", default=None,
                    help="also append result lines to this file")
    ap.add_argument("--base-ms", type=float, default=None,
                    help="reference t(S=1) ms for the efficiency column "
                    "when running a single S in isolation")
    ap.add_argument("--warp-filter", default="easu",
                    choices=("easu", "bilinear"),
                    help="corrective-warp sampling filter (easu = reference "
                    "parity default; bilinear = fast option)")
    args = ap.parse_args()

    if args.mesh:
        flags = os.environ.get("XLA_FLAGS", "")
        if "--xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()

    import jax

    if args.mesh:
        jax.config.update("jax_platforms", "cpu")

    from livevisionkit_tpu.utils import compile_cache

    cache = compile_cache.enable_default()
    log(f"compilation cache: {cache or 'disabled'}")

    import jax.numpy as jnp
    import numpy as np

    import livevisionkit_tpu as lvk
    from __graft_entry__ import _flagship_filter
    from livevisionkit_tpu.parallel import streams as pstreams
    from profile_stages import scan_time

    h, w = (270, 480) if (args.mesh and args.size is None) else map(
        int, (args.size or "1080x1920").split("x")
    )
    sizes = [int(s) for s in args.streams.split(",")]
    rng = np.random.default_rng(0)
    pix = rng.uniform(0.1, 0.9, size=(3, h, w)).astype(np.float32)

    # Detection sized to the frame so mesh mode stays CPU-tractable.
    if h >= 540:
        filt = _flagship_filter(warp_filter=args.warp_filter)
    else:
        # Detection size must divide the 12x16 suppression grid.
        det = (max(h // 2 // 12, 2) * 12, max(w // 2 // 16, 2) * 16)
        filt = _flagship_filter(detection=det, grid=(12, 16), min_samples=30,
                                hypotheses=128, warp_filter=args.warp_filter)
    spec = lvk.FrameSpec(height=h, width=w, channels=3,
                         format=lvk.PixelFormat.YUV)

    results = []
    base_ms = args.base_ms
    for s_count in sizes:
        if args.mesh and s_count > len(jax.devices()):
            log(f"S={s_count}: skipped (only {len(jax.devices())} devices)")
            break
        batch = jnp.asarray(
            np.stack([pix * (1.0 + 0.01 * i) for i in range(s_count)])
        )

        if args.control:
            # Per-stream work with zero cross-stream coupling and no
            # data-dependent anything: a 5x5 separable blur + pointwise chain,
            # iterated to land near the stabilizer's per-step cost.
            def one_control(x):
                for _ in range(4):
                    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0)), mode="edge")
                    x = sum(xp[:, i : i + x.shape[1], :] for i in range(5)) / 5.0
                    xp = jnp.pad(x, ((0, 0), (0, 0), (2, 2)), mode="edge")
                    x = sum(xp[:, :, i : i + x.shape[2]] for i in range(5)) / 5.0
                    x = jnp.tanh(x) + 0.1 * x * x
                return x

            if args.mesh:
                mesh = pstreams.make_mesh(s_count, 1)
                from jax.sharding import NamedSharding, PartitionSpec as P

                sh = NamedSharding(mesh, P("stream"))
                batch = jax.device_put(batch, sh)
                state = jax.device_put(jnp.zeros((s_count,)), sh)
            else:
                state = jnp.zeros((s_count,))

            def body(st, t):
                out = jax.vmap(one_control)(batch + 1e-9 * t)
                return st + 1e-9, jnp.sum(out[..., ::128, ::128])

            label = "control"
        elif args.mesh:
            mesh = pstreams.make_mesh(s_count, 1)
            ms_filt = pstreams.MultiStreamFilter(filt, s_count, mesh,
                                                 tile_frames=False)
            state = ms_filt.init(spec)
            batch = ms_filt._shard(batch, tile_w=False)
            step_fn = ms_filt.step
            label = "mesh"
        else:
            state = jax.vmap(lambda _: filt.init(spec))(jnp.arange(s_count))
            step_fn = jax.vmap(filt.step)
            label = "vmap_1chip"

        if not args.control:
            def body(st, t):
                frames = lvk.Frame.create(
                    batch + 1e-9 * t,
                    timestamp=jnp.broadcast_to(t.astype(jnp.float32) / 60.0,
                                               (s_count,)),
                    fmt=lvk.PixelFormat.YUV,
                )
                frames = frames.replace(
                    valid=jnp.ones((s_count,), jnp.bool_)
                )
                st, out = step_fn(st, frames)
                return st, jnp.sum(out.pixels[..., ::128, ::128])

        log(f"S={s_count}: compiling + measuring ({label}, {h}x{w}) ...")
        t0 = time.perf_counter()
        ms = scan_time(body, state, n1=20, n2=80, reps=5, stat="median")
        log(f"S={s_count}: done in {time.perf_counter() - t0:.0f}s wall")
        if base_ms is None:
            base_ms = ms
        eff = base_ms / ms if args.mesh else (base_ms * s_count) / ms
        line = {
            "warp_filter": args.warp_filter,
            "mode": ("mesh" if args.mesh else "vmap_1chip")
            + ("_control" if args.control else ""),
            "streams": s_count,
            "size": f"{h}x{w}",
            "ms_per_step": round(ms, 3),
            "frames_per_s": round(1000.0 * s_count / ms, 1),
            "scaling_efficiency": round(eff, 3),
        }
        print(json.dumps(line), flush=True)
        results.append(line)
        if args.json_out:
            with open(args.json_out, "a") as f:
                f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
