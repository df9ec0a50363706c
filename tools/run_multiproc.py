"""Real cross-process multi-host run (r3 VERDICT #3).

Spawns TWO OS processes, each owning 4 virtual CPU devices, joined through
``jax.distributed.initialize`` into one 8-device global runtime; runs
``MultiHostStreamFilter.step`` on the global host-major Mesh(("stream",
"tile")) = (4, 2) with per-process local frame feeds; then re-runs the
identical workload single-process on 8 devices and asserts BIT-IDENTICAL
per-stream outputs.

This exercises the code paths the single-process degenerate tests cannot:
``jax.process_index``-dependent stream assignment, cross-process
``make_array_from_process_local_data`` feeds, addressable-shard-only egress,
and a pjit program compiled against a mesh whose rows live on different
processes.  BASELINE.md's ">= 2 hosts" scaling criterion is about DCN-free
steady state — the stream axis carries no collectives — which this run
validates at the process-boundary level (real DCN transport needs real
hosts; the program is identical).

Usage:  python tools/run_multiproc.py            # driver: spawn + compare
        python tools/run_multiproc.py --worker K # internal
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
N_LOCAL_DEVICES = 4
N_STREAMS = 4
N_TILES = 2
STEPS = 8
SIZE = (96, 128)


def _make_frame_np(stream: int, t: int):
    """Deterministic synthetic frame: a diagonal gradient pattern scrolling
    at a per-stream velocity (content is irrelevant; determinism is not)."""
    import numpy as np

    h, w = SIZE
    yy, xx = np.meshgrid(
        np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32),
        indexing="ij",
    )
    vx = 0.8 + 0.35 * stream
    vy = 0.5 - 0.2 * stream
    ph = 0.07 * (xx - vx * t) + 0.05 * (yy - vy * t)
    pat = 0.5 + 0.25 * np.sin(ph * 6.0) + 0.2 * np.cos(ph * 17.0 + stream)
    return pat.astype(np.float32)[None]  # (1, H, W)


def _build(mesh):
    import livevisionkit_tpu as lvk
    from livevisionkit_tpu.parallel.multihost import MultiHostStreamFilter

    settings = lvk.StabilizationFilterSettings(
        tracker=lvk.FrameTrackerSettings(
            detection_size=(48, 64),
            detector=lvk.FeatureDetectorSettings(
                grid_shape=(6, 8), fast_threshold_init=0.05
            ),
            min_motion_samples=8,
            motion=lvk.MotionEstimationSettings(hypotheses=64),
        ),
        smoother=lvk.PathSmootherSettings(predictive_samples=2),
    )
    filt = lvk.StabilizationFilter(settings=settings)
    mhf = MultiHostStreamFilter(filt, mesh)
    spec = lvk.FrameSpec(
        height=SIZE[0], width=SIZE[1], channels=1, format=lvk.PixelFormat.GRAY
    )
    return mhf, spec


def _run(mhf, spec):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import livevisionkit_tpu as lvk

    state = mhf.init(spec)
    step = mhf.jit_step()
    local = mhf.local_streams()
    outs: dict[str, np.ndarray] = {}
    for t in range(STEPS):
        pix = np.stack([_make_frame_np(s, t)[0] for s in local])
        frames = jax.vmap(
            lambda p, tt=t: lvk.Frame.create(
                p[None], timestamp=tt / 30.0, fmt=lvk.PixelFormat.GRAY
            )
        )(jnp.asarray(pix))
        gframes = mhf.put_frames(frames)
        state, out = step(state, gframes)
        for k, arr in zip(local, mhf.fetch(out)):
            outs[f"s{k}_t{t}"] = np.asarray(arr)
    return outs


def worker(pid: int, port: int, out_path: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=N_PROC,
        process_id=pid,
    )
    assert jax.device_count() == N_PROC * N_LOCAL_DEVICES, jax.device_count()
    assert len(jax.local_devices()) == N_LOCAL_DEVICES

    from livevisionkit_tpu.parallel import multihost

    mesh = multihost.make_global_mesh(N_STREAMS, N_TILES)
    mhf, spec = _build(mesh)
    local = mhf.local_streams()
    print(f"[worker {pid}] local streams: {local}", flush=True)
    assert len(local) == N_STREAMS // N_PROC  # host-major row ownership
    outs = _run(mhf, spec)

    import numpy as np

    np.savez(out_path, **outs)
    print(f"[worker {pid}] wrote {len(outs)} outputs", flush=True)


def single(out_path: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from livevisionkit_tpu.parallel import multihost

    mesh = multihost.make_global_mesh(N_STREAMS, N_TILES)
    mhf, spec = _build(mesh)
    outs = _run(mhf, spec)

    import numpy as np

    np.savez(out_path, **outs)
    print(f"[single] wrote {len(outs)} outputs", flush=True)


def driver() -> int:
    import numpy as np

    port = 12765
    tmp = tempfile.mkdtemp(prefix="lvk_mh_")
    env_base = {
        **os.environ,
        "PYTHONPATH": "",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={N_LOCAL_DEVICES}",
    }
    procs = []
    for pid in range(N_PROC):
        out = os.path.join(tmp, f"worker{pid}.npz")
        procs.append(
            (
                subprocess.Popen(
                    [sys.executable, os.path.abspath(__file__),
                     "--worker", str(pid), "--port", str(port), "--out", out],
                    env=env_base, cwd=REPO,
                ),
                out,
            )
        )
    for p, _ in procs:
        rc = p.wait(timeout=1200)
        if rc != 0:
            print(f"FAIL: worker exited {rc}")
            return 1

    # Reference: identical workload, one process, 8 local devices.
    ref_out = os.path.join(tmp, "single.npz")
    rc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--single", "--out", ref_out],
        env={
            **env_base,
            "XLA_FLAGS": f"--xla_force_host_platform_device_count="
            f"{N_PROC * N_LOCAL_DEVICES}",
        },
        cwd=REPO,
    ).returncode
    if rc != 0:
        print("FAIL: single-process reference failed")
        return 1

    ref = np.load(ref_out)
    got: dict[str, np.ndarray] = {}
    for _, out in procs:
        with np.load(out) as z:
            got.update({k: z[k] for k in z.files})
    assert set(got) == set(ref.files), (sorted(got), sorted(ref.files))
    worst = 0.0
    for k in ref.files:
        d = float(np.abs(got[k].astype(np.float64) - ref[k]).max())
        worst = max(worst, d)
    print(f"compared {len(ref.files)} stream-steps; max |diff| = {worst}")
    if worst != 0.0:
        print("FAIL: cross-process outputs differ from single-process run")
        return 1
    print("MULTIHOST OK: 2 processes x 4 devices == 1 process x 8 devices "
          "(bit-identical)")
    return 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--port", type=int, default=12765)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker, args.port, args.out)
    elif args.single:
        single(args.out)
    else:
        sys.exit(driver())


if __name__ == "__main__":
    main()
