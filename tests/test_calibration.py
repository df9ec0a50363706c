import numpy as np
import jax.numpy as jnp
import pytest

from livevisionkit_tpu.data.frame import Frame, PixelFormat
from livevisionkit_tpu.filters.lens_correction import LensCorrectionFilter
from livevisionkit_tpu.filters.base import FrameSpec
from livevisionkit_tpu.vision import calibration, chessboard
from livevisionkit_tpu.vision.calibration import CameraParameters


GT = CameraParameters(
    fx=420.0, fy=410.0, cx=160.0, cy=120.0, k1=-0.25, k2=0.07, p1=0.001, p2=-0.001
)
SIZE = (240, 320)


def _synth_views(rng, n_views=8, pattern=(7, 5)):
    """Project a planar board through GT intrinsics at random poses."""
    cols, rows = pattern
    obj = np.stack(
        np.meshgrid(np.arange(cols, dtype=np.float64), np.arange(rows)), -1
    ).reshape(-1, 2)
    views_obj, views_img = [], []
    while len(views_obj) < n_views:
        rvec = rng.uniform(-0.3, 0.3, 3)
        tvec = np.array(
            [rng.uniform(-1.5, 0.5), rng.uniform(-1.2, 0.2), rng.uniform(8, 14)]
        )
        proj = calibration._project(
            np.array([GT.fx, GT.fy, GT.cx, GT.cy, GT.k1, GT.k2, GT.p1, GT.p2, GT.k3]),
            np.c_[obj, np.zeros(len(obj))],
            rvec,
            tvec,
        )
        if (proj[:, 0].min() < 5 or proj[:, 0].max() > SIZE[1] - 5
                or proj[:, 1].min() < 5 or proj[:, 1].max() > SIZE[0] - 5):
            continue
        noise = rng.normal(0, 0.05, proj.shape)
        views_obj.append(obj)
        views_img.append(proj + noise)
    return views_obj, views_img


def test_calibrate_recovers_intrinsics(rng):
    objs, imgs = _synth_views(rng)
    est, rms = calibration.calibrate(objs, imgs, SIZE)
    assert rms < 0.2, rms
    assert abs(est.fx - GT.fx) / GT.fx < 0.02
    assert abs(est.fy - GT.fy) / GT.fy < 0.02
    assert abs(est.cx - GT.cx) < 5
    assert abs(est.cy - GT.cy) < 5
    assert abs(est.k1 - GT.k1) < 0.05


@pytest.mark.slow
def test_undistort_field_straightens_lines():
    # A distorted image of a straight vertical line: after undistortion the
    # line's x coordinate should be ~constant.  Build the distorted frame by
    # forward-mapping a line through the model.
    h, w = SIZE
    img = np.zeros((h, w), np.float32)
    # Draw the distorted image of the vertical line x=220 (undistorted
    # coords relative to GT's own matrix): for each y, distort the point.
    for yq in range(6, h - 6):
        xn = (220.0 - GT.cx) / GT.fx
        yn = (yq - GT.cy) / GT.fy
        xd, yd = calibration.distort_normalized(xn, yn, GT)
        xi = int(round(xd * GT.fx + GT.cx))
        yi = int(round(yd * GT.fy + GT.cy))
        if 0 <= xi < w and 0 <= yi < h:
            img[yi, max(xi - 1, 0) : xi + 2] = 1.0

    fld = calibration.undistort_field(GT, SIZE, alpha=0.0)
    out = np.asarray(fld.apply(jnp.asarray(img)[None], exact_2x2=False))[0]
    ys, xs = np.nonzero(out > 0.5)
    sel = (ys > 40) & (ys < h - 40)
    assert sel.sum() > 40
    # Undistorted line must be much straighter than the distorted one.
    ys_i, xs_i = np.nonzero(img > 0.5)
    sel_i = (ys_i > 40) & (ys_i < h - 40)
    spread_in = np.ptp(xs_i[sel_i])
    spread_out = np.ptp(xs[sel])
    assert spread_out <= max(3, 0.4 * spread_in), (spread_in, spread_out)


def test_lens_correction_filter_runs(rng):
    filt = LensCorrectionFilter(parameters=GT)
    spec = FrameSpec(SIZE[0], SIZE[1], 1, PixelFormat.GRAY)
    state = filt.init(spec)
    frame = Frame.create(
        jnp.asarray(rng.uniform(size=(1,) + SIZE).astype(np.float32)),
        fmt=PixelFormat.GRAY,
    )
    _, out = filt.step(state, frame)
    assert out.pixels.shape == (1,) + SIZE


def test_lens_correction_warps_alpha_with_pixels(rng):
    """Alpha must follow the colour geometry through the undistort warp
    (the alpha contract in data/frame.py): warping a copy of the luma plane
    as alpha must land exactly on the undistorted luma."""
    filt = LensCorrectionFilter(parameters=GT)
    spec = FrameSpec(SIZE[0], SIZE[1], 1, PixelFormat.GRAY, has_alpha=True)
    state = filt.init(spec)
    pix = jnp.asarray(rng.uniform(size=(1,) + SIZE).astype(np.float32))
    frame = Frame.create(pix, fmt=PixelFormat.GRAY, alpha=pix[0])
    _, out = filt.step(state, frame)
    assert out.alpha is not None
    np.testing.assert_allclose(
        np.asarray(out.alpha), np.asarray(out.pixels[0]), atol=1e-6
    )


def _render_board(pose_h, pattern=(9, 6), square=24, size=(240, 320)):
    """Render a synthetic chessboard through a homography; returns image and
    ground-truth inner-corner pixel positions."""
    from livevisionkit_tpu.models.homography import Homography

    cols, rows = pattern
    h, w = size
    bh, bw = (rows + 1) * square, (cols + 1) * square
    yy, xx = np.mgrid[0:bh, 0:bw]
    board = (((yy // square) + (xx // square)) % 2).astype(np.float32)
    board = 0.15 + 0.7 * board
    canvas = np.full((h, w), 0.5, np.float32)
    canvas[: board.shape[0], : board.shape[1]] = board
    hm = Homography.from_matrix(jnp.asarray(pose_h.astype(np.float32)))
    img = hm.warp(jnp.asarray(canvas), fill=0.5)
    corners = np.stack(
        np.meshgrid(
            (np.arange(cols) + 1) * square, (np.arange(rows) + 1) * square
        ),
        -1,
    ).reshape(-1, 2).astype(np.float64)
    ph = np.c_[corners, np.ones(len(corners))] @ np.asarray(pose_h).T
    proj = ph[:, :2] / ph[:, 2:]
    return np.asarray(img), proj


def test_chessboard_detection():
    pose = np.array([[0.9, 0.05, 40.0], [-0.04, 0.92, 30.0], [1e-5, 2e-5, 1.0]])
    img, gt = _render_board(pose)
    found = chessboard.find_chessboard(img, pattern=(9, 6))
    assert found is not None, "board not found"
    assert found.shape == (54, 2)
    # Each found corner matches a distinct ground-truth corner closely.
    from scipy.spatial import cKDTree

    d, idx = cKDTree(gt).query(found)
    assert d.max() < 2.0, d.max()
    assert len(np.unique(idx)) == 54


def test_calibrate_cli_end_to_end(rng, tmp_path):
    """Full CCTool workflow: chessboard video -> profile JSON."""
    import pytest

    cv2 = pytest.importorskip("cv2")
    from livevisionkit_tpu.runtime import calibrate_cli

    src = str(tmp_path / "board.avi")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"MJPG"), 30, (320, 240))
    assert w.isOpened()
    n = 30
    for t in range(n):
        # Varied in-plane rotation AND out-of-plane tilt (the perspective
        # terms): Zhang calibration is degenerate without tilted views.
        ang = 0.15 * np.sin(t / 4.0)
        sc = 0.85 + 0.1 * np.cos(t / 5.0)
        c, s = sc * np.cos(ang), sc * np.sin(ang)
        px = 8e-4 * np.sin(t / 3.0)
        py = 8e-4 * np.cos(t / 3.5)
        pose = np.array(
            [[c, -s, 30.0 + 6 * t], [s, c, 25.0 + 2.5 * t], [px, py, 1.0]]
        )
        img, _ = _render_board(pose, pattern=(7, 5), square=22)
        w.write(np.repeat((img * 255).astype(np.uint8)[:, :, None], 3, 2))
    w.release()

    out = str(tmp_path / "profile.json")
    rc = calibrate_cli.main(
        [src, out, "--pattern", "7x5", "--captures", "5", "--every", "3"]
    )
    assert rc == 0
    import json

    prof = json.load(open(out))
    assert set(prof) == {"fx", "fy", "cx", "cy", "k1", "k2", "p1", "p2", "k3"}
    assert 50 < prof["fx"] < 5000 and 50 < prof["fy"] < 5000
    # Profile loads into the lens-correction filter.
    from livevisionkit_tpu import CameraParameters, LensCorrectionFilter

    filt = LensCorrectionFilter(parameters=CameraParameters.from_dict(prof))
    state = filt.init(FrameSpec(240, 320, 1, PixelFormat.GRAY))
    assert state.offsets.shape[0] == 2
