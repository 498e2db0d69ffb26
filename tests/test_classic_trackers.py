"""Classic tracker (BYTETracker/BOTSORT/Kalman/GMC) unit tests on synthetic
moving-box sequences."""

import numpy as np

from mo_yolo_tpu.trackers import BOTSORT, BYTETracker, GMC, KalmanFilterXYAH


def _moving_dets(T=10, n=2, conf=0.9):
    seqs = []
    for t in range(T):
        dets = []
        for k in range(n):
            x = 50 + 40 * k + 3 * t
            y = 60 + 30 * k + 2 * t
            dets.append([x, y, x + 20, y + 40, conf, 0])
        seqs.append(np.array(dets, float))
    return seqs


def test_kalman_tracks_constant_velocity():
    kf = KalmanFilterXYAH()
    mean, cov = kf.initiate(np.array([10.0, 10.0, 0.5, 40.0]))
    for t in range(1, 8):
        mean, cov = kf.predict(mean, cov)
        mean, cov = kf.update(mean, cov, np.array([10.0 + 5 * t, 10.0, 0.5, 40.0]))
    mean, cov = kf.predict(mean, cov)
    assert abs(mean[0] - (10 + 5 * 8)) < 2.0  # learned the velocity
    assert abs(mean[4] - 5.0) < 1.0


def test_byte_tracker_stable_ids():
    bt = BYTETracker()
    ids_per_frame = []
    for dets in _moving_dets():
        out = bt.update(dets)
        ids_per_frame.append(sorted(out[:, 4].astype(int).tolist()))
    assert ids_per_frame[0] == [1, 2]
    for ids in ids_per_frame[1:]:
        assert ids == ids_per_frame[0], "IDs must stay stable"


def test_byte_tracker_lost_and_reacquired():
    bt = BYTETracker()
    seq = _moving_dets(12)
    ids = None
    for t, dets in enumerate(seq):
        if 4 <= t < 6:   # occlusion: drop detection of object 0
            dets = dets[1:]
        out = bt.update(dets)
        if t == 3:
            ids = set(out[:, 4].astype(int))
        if t == 7:
            # object 0 reacquired with the SAME id (within track_buffer)
            assert set(out[:, 4].astype(int)) == ids


def test_byte_tracker_low_conf_second_stage():
    bt = BYTETracker()
    seq = _moving_dets(6)
    for t, dets in enumerate(seq):
        if t >= 3:
            dets = dets.copy()
            dets[0, 4] = 0.3  # drops below high thresh but above low
        out = bt.update(dets)
    assert len(out) == 2  # low-conf stage keeps the track alive


def test_byte_tracker_unconfirmed_suppresses_one_frame_fp():
    """A detection that appears for exactly one frame mid-stream must never
    emit a track ID (reference two-frame confirmation); a detection that
    persists for two frames confirms and appears from its second frame."""
    bt = BYTETracker()
    seq = _moving_dets(8)
    fp = np.array([[300.0, 300.0, 330.0, 350.0, 0.9, 0]])
    emitted_fp_id = False
    for t, dets in enumerate(seq):
        if t == 3:  # one-frame false positive
            dets = np.concatenate([dets, fp])
        out = bt.update(dets)
        if len(out) > 2:
            emitted_fp_id = True
    assert not emitted_fp_id
    # persistent new object: unconfirmed on its first frame, emitted after
    bt2 = BYTETracker()
    counts = []
    for t, dets in enumerate(_moving_dets(6)):
        if t >= 2:
            dets = np.concatenate([dets, fp + 2.0 * (t - 2)])
        counts.append(len(bt2.update(dets)))
    assert counts[2] == 2     # new object still unconfirmed
    assert counts[3] == 3     # confirmed on second sighting


def test_gmc_estimates_translation():
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    g = GMC(downscale=1)
    g.apply(base)
    shifted = np.roll(np.roll(base, 6, axis=0), 10, axis=1)
    H = g.apply(shifted)          # 2x3 affine (round-4 GMC returns a
    assert H.shape == (2, 3)      # similarity transform, gmc.py:263)
    # pure translation: rotation/scale part ~identity, t = (dx, dy)
    np.testing.assert_allclose(H[:, :2], np.eye(2), atol=0.05)
    assert abs(H[0, 2] - 10) <= 1 and abs(H[1, 2] - 6) <= 1


def test_botsort_runs_with_images():
    bs = BOTSORT()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (120, 160, 3), np.uint8)
    for dets in _moving_dets(5):
        out = bs.update(dets, img)
    assert len(out) == 2
