import numpy as np
import pytest

import fixtures
from livevisionkit_tpu.filters.base import CompositeFilter, IdentityFilter
from livevisionkit_tpu.runtime.stream import stream


def _clip_uint8(rng, n=16, size=(96, 128)):
    base = fixtures.make_texture(320, 320, rng)
    poses, _ = fixtures.shaky_path(n, rng, margin=80.0, shake_px=2.0)
    frames = []
    for p in poses:
        g = np.asarray(fixtures.render_frame(base, p, size))
        bgr = np.repeat((g * 255).astype(np.uint8)[:, :, None], 3, axis=2)
        frames.append(bgr)
    return frames


def test_stream_identity_round_trip(rng):
    frames = _clip_uint8(rng)
    reader = ((f, t / 30.0) for t, f in enumerate(frames))
    outs = []
    stats = stream(
        CompositeFilter(filters=(IdentityFilter(),)),
        reader,
        on_output=lambda px, ts: outs.append((px.copy(), ts)),
    )
    assert stats.frames_in == len(frames)
    assert stats.frames_out == len(frames)
    # Round trip: BGR->YUV->filter->BGR within 8-bit tolerance.
    for (px, ts), src in zip(outs, frames):
        got = (np.clip(px, 0, 1).transpose(1, 2, 0) * 255).astype(np.int32)
        assert np.abs(got - src.astype(np.int32)).max() <= 2


@pytest.mark.slow
def test_stream_stabilizer_delay_and_order(rng):
    from livevisionkit_tpu import (
        FeatureDetectorSettings,
        FrameTrackerSettings,
        PathSmootherSettings,
        StabilizationFilter,
        StabilizationFilterSettings,
    )

    frames = _clip_uint8(rng)
    filt = StabilizationFilter(
        settings=StabilizationFilterSettings(
            tracker=FrameTrackerSettings(
                detection_size=(96, 120),
                detector=FeatureDetectorSettings(
                    grid_shape=(8, 10), fast_threshold_init=0.06
                ),
                min_motion_samples=15,
            ),
            smoother=PathSmootherSettings(predictive_samples=3),
        )
    )
    reader = ((f, t / 30.0) for t, f in enumerate(frames))
    outs = []
    stats = stream(filt, reader, on_output=lambda px, ts: outs.append(ts))
    assert stats.frames_in == len(frames)
    # 3-frame delay: outputs are frames 0..n-4, timestamps ordered.
    assert stats.frames_out == len(frames) - 3
    np.testing.assert_allclose(outs, [t / 30.0 for t in range(len(frames) - 3)],
                               atol=1e-6)


@pytest.mark.slow
def test_cli_end_to_end(rng, tmp_path):
    cv2 = pytest.importorskip("cv2")
    from livevisionkit_tpu.runtime import cli

    frames = _clip_uint8(rng, n=14)
    src = str(tmp_path / "in.avi")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"MJPG"), 30, (128, 96))
    assert w.isOpened()
    for f in frames:
        w.write(f)
    w.release()

    dst = str(tmp_path / "out.avi")
    csv = str(tmp_path / "stats.csv")
    rc = cli.main(
        ["-f", "vs.smoothing=3", "-v", "--profile-filters", "-L", csv,
         src, dst, "-c", "MJPG"]
    )
    assert rc == 0
    cap = cv2.VideoCapture(dst)
    assert cap.isOpened()
    n_out = 0
    while True:
        ok, _ = cap.read()
        if not ok:
            break
        n_out += 1
    assert n_out == 14 - 3  # stabilizer delay
    rows = [line.strip().split(",") for line in open(csv).read().splitlines()]
    assert rows[0] == ["metric", "name", "avg_ms", "dev_ms", "count"]
    stats = {r[0]: r for r in rows[1:]}
    assert int(stats["frames_out"][4]) == n_out
    # Per-filter avg +- dev rows (reference VideoProcessor.cpp:312-356).
    per_filter = [r for r in rows if r[0] == "filter_time"]
    assert len(per_filter) == 1 and "Stabilization" in per_filter[0][1]
    assert float(per_filter[0][2]) > 0 and int(per_filter[0][4]) > 0


def test_cli_list_encoders(capsys):
    pytest.importorskip("cv2")
    from livevisionkit_tpu.runtime import cli

    assert cli.main(["-C"]) == 0
    out = capsys.readouterr().out
    assert "available" in out  # at least one encoder probes OK


def test_cli_filter_specs():
    from livevisionkit_tpu.runtime import cli

    name, opts = cli._parse_filter_spec("vs.smoothing=15.crop_out=1")
    assert name == "vs" and opts == {"smoothing": "15", "crop_out": "1"}
    f = cli._build_filter(name, opts)
    assert f.settings.smoother.predictive_samples == 15
    assert f.settings.crop_output is True
    f2 = cli._build_filter("fsr", {"size": "640x360"})
    assert f2.settings.output_size == (360, 640)
    with pytest.raises(SystemExit):
        cli._build_filter("nope", {})


def test_stream_reader_exception_surfaces(rng):
    """r3 VERDICT #9: decode errors must surface to the caller like encode
    errors (the reader thread used to swallow them as a stranded daemon)."""
    frames = _clip_uint8(rng, n=6)

    def bad_reader():
        for t, f in enumerate(frames):
            if t == 3:
                raise RuntimeError("decode exploded")
            yield f, t / 30.0

    with pytest.raises(RuntimeError, match="decode exploded"):
        stream(
            CompositeFilter(filters=(IdentityFilter(),)),
            bad_reader(),
            on_output=lambda px, ts: None,
        )


def test_stream_writer_abort_does_not_strand_reader(rng):
    """A failing writer aborts the pipeline; the reader thread must unblock
    from a full input queue and join (bounded put with stop polling)."""
    import itertools

    def endless_reader():
        f = _clip_uint8(rng, n=1)[0]
        for t in itertools.count():
            yield f, t / 30.0

    def bad_writer(px, ts):
        raise IOError("encoder died")

    with pytest.raises(IOError, match="encoder died"):
        stream(
            CompositeFilter(filters=(IdentityFilter(),)),
            endless_reader(),
            on_output=bad_writer,
            queue_depth=2,
        )
    # No assertion on threads needed: stream() joins both with timeouts and
    # raising past a stuck join would fail this test by timeout.


def test_stream_latency_quantiles(rng):
    frames = _clip_uint8(rng, n=12)
    reader = ((f, t / 30.0) for t, f in enumerate(frames))
    stats = stream(
        CompositeFilter(filters=(IdentityFilter(),)),
        reader,
        on_output=lambda px, ts: None,
    )
    q = stats.latency_quantiles()
    assert set(q) == {"p50_ms", "p95_ms", "p99_ms"}
    assert 0 < q["p50_ms"] <= q["p95_ms"] <= q["p99_ms"]
    assert len(stats.latencies) == stats.frames_out


def test_frame_time_hud(rng):
    """Reference test-mode HUD (VSFilter.cpp:368-383): frame time stamped on
    outputs, green within budget / red over."""
    from livevisionkit_tpu.runtime.hud import GREEN, RED, draw_frame_time_hud

    img = np.full((3, 80, 160), 0.5, np.float32)
    over = draw_frame_time_hud(img.copy(), frame_ms=9.0, budget_ms=6.0)
    under = draw_frame_time_hud(img.copy(), frame_ms=2.0, budget_ms=6.0)
    assert not np.array_equal(over, img) and not np.array_equal(under, img)
    # Dominant stamped colour channel: red over budget, green under.
    d_over = over - img
    d_under = under - img
    assert d_over[0][d_over[0] > 0].size and RED[0] > RED[1]
    assert (d_over[0] > 0.3).sum() > (d_over[1] > 0.3).sum()
    assert (d_under[1] > 0.3).sum() > (d_under[0] > 0.3).sum()

    # Through the pipeline: outputs carry the overlay.
    frames = _clip_uint8(rng, n=8)
    reader = ((f, t / 30.0) for t, f in enumerate(frames))
    outs = []
    stream(
        CompositeFilter(filters=(IdentityFilter(),)),
        reader,
        on_output=lambda px, ts: outs.append(px.copy()),
        hud_budget_ms=6.0,
    )
    # HUD pixels differ from the plain round trip in the stamp region.
    assert len(outs) == 8
    region = np.stack(outs)[:, :, 6:30, 6:80]
    assert (np.abs(region - 0.5) > 0.35).any()
