"""Loader semantics vs the reference: split rules, label accumulation,
mapping-key typo, test-set label tolerance — on a fake on-disk dataset."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from iris_style_transfer_tpu.data.openeds2019 import (
    MAPPING_KEY,
    _test_split_size,
    load_data_openeds2019,
)
from iris_style_transfer_tpu.data.openeds2020 import (
    load_data_openeds2020,
    load_labels_openeds2020,
    stream_openeds2020,
)
from iris_style_transfer_tpu.utils import seed as seed_all


@pytest.fixture()
def fake_openeds2019(tmp_path):
    rng = np.random.default_rng(0)
    base = tmp_path / "openeds2019"
    img_dirs, json_paths, seg_dirs = [], [], []
    # two "splits", each with users; user B has only 2 images (skipped)
    specs = [
        ("train", {"userA": 5, "userB": 2, "userC": 4}),
        ("validation", {"userD": 5}),
    ]
    for split, users in specs:
        d = base / "Semantic_Segmentation_Dataset" / split
        (d / "images").mkdir(parents=True)
        (d / "labels").mkdir(parents=True)
        mapping = []
        for user, n in users.items():
            names = [f"{user}_{i}.png" for i in range(n)]
            mapping.append({"id": user, MAPPING_KEY: names})
            for name in names:
                arr = rng.integers(0, 255, (40, 60), dtype=np.uint8)
                Image.fromarray(arr, "L").save(d / "images" / name)
                np.save(d / "labels" / (name[:-4] + ".npy"), rng.integers(0, 4, (40, 60)))
        jp = base / f"OpenEDS_{split}_userID_mapping_to_images.json"
        jp.write_text(json.dumps(mapping))
        img_dirs.append(str(d / "images"))
        seg_dirs.append(str(d / "labels"))
        json_paths.append(str(jp))
    return img_dirs, json_paths, seg_dirs


def test_load_openeds2019_split_semantics(fake_openeds2019):
    img_dirs, json_paths, seg_dirs = fake_openeds2019
    seed_all(42, verbose=False)
    tr_x, tr_y, tr_m, te_x, te_y, te_m, nc = load_data_openeds2019(
        0.2, load_seg=True, image_paths=img_dirs, json_paths=json_paths, seg_paths=seg_dirs
    )
    # userB (2 images) skipped -> 3 classes, accumulated across splits (:316)
    assert nc == 3
    # all of userB's images excluded
    assert len(tr_x) + len(te_x) == 5 + 4 + 5
    # per-user 20% test split with torch random_split sizing: 5 -> 1 test,
    # 4 -> 0 test (floor(0.8) = 0, remainder goes to train first)
    assert len(te_x) == 2 and len(tr_x) == 12
    # labels are contiguous class ids
    assert set(tr_y) | set(te_y) == {0, 1, 2}
    # images uint8 (native file depth) with channel dim; seg labels loaded
    assert tr_x[0].shape == (40, 60, 1) and tr_x[0].dtype == np.uint8
    assert tr_m[0].shape == (40, 60)


@pytest.mark.filterwarnings("ignore:Length of split at index")
def test_split_sizes_match_torch_random_split():
    """Per-user split sizes must match torch.utils.data.random_split's
    fractional flooring + round-robin remainder (data_preprocessing.py:312)."""
    import torch

    for n in range(3, 40):
        for ratio in (0.1, 0.2, 0.25, 0.3, 0.5):
            tr, te = torch.utils.data.random_split(list(range(n)), [1 - ratio, ratio])
            assert _test_split_size(n, ratio) == len(te), (n, ratio)


@pytest.fixture()
def fake_openeds2020(tmp_path):
    rng = np.random.default_rng(1)
    base = tmp_path / "gaze"
    for split, extra_labels in (("validation", 0), ("test", 5)):
        for seq in ("0001", "0002"):
            sd = base / split / "sequences" / seq
            sd.mkdir(parents=True)
            n = 4
            for i in range(n):
                arr = rng.integers(0, 255, (40, 64), dtype=np.uint8)
                Image.fromarray(arr, "L").save(sd / f"{i:03d}.png")
            ld = base / split / "labels"
            ld.mkdir(parents=True, exist_ok=True)
            rows = [
                f"{i},{rng.random():.4f},{rng.random():.4f},{rng.random():.4f}"
                for i in range(n + extra_labels)
            ]
            (ld / f"{seq}.txt").write_text("\n".join(rows))
    return str(base) + "/"


def test_stream_openeds2020_matches_eager(fake_openeds2020):
    """The streaming batch source yields the same frames/labels as the
    eager loader, with batch_iterator's final-batch pad+valid contract."""
    imgs, labels = load_data_openeds2020(
        extract_feature=False, data_path=fake_openeds2020, postfix="validation/"
    )
    np.testing.assert_array_equal(
        load_labels_openeds2020(fake_openeds2020, "validation/"), labels
    )

    got_imgs, got_labs, n_valid = [], [], 0
    for bi, (bimgs, blabs, valid) in enumerate(
        stream_openeds2020(fake_openeds2020, "validation/", batch_size=3)
    ):
        assert bimgs.shape[0] == 3 and blabs.shape[0] == 3 and valid.shape == (3,)
        got_imgs.append(bimgs[valid]); got_labs.append(blabs[valid])
        n_valid += int(valid.sum())
    assert n_valid == len(imgs)  # 8 frames -> batches of 3, 3, 2+pad
    np.testing.assert_array_equal(np.concatenate(got_imgs), imgs)
    np.testing.assert_array_equal(np.concatenate(got_labs), labels)


def test_load_openeds2020_semantics(fake_openeds2020):
    imgs, labels = load_data_openeds2020(
        extract_feature=False, data_path=fake_openeds2020, postfix="validation/"
    )
    assert imgs.shape == (8, 40, 64, 1)
    assert labels.shape == (8, 3)  # index column dropped
    # test split: label files 5 rows longer are tolerated and truncated (:399)
    imgs_t, labels_t = load_data_openeds2020(
        extract_feature=False, data_path=fake_openeds2020, postfix="test/"
    )
    assert imgs_t.shape[0] == 8 and labels_t.shape == (8, 3)


def test_synthetic_gaze_mode():
    """gaze=True returns unit gaze vectors whose x/y components match the
    iris offset inside the sclera (the geometric signal the landmark
    features recover); gaze=False keeps the historical RNG stream."""
    from iris_style_transfer_tpu.data.synthetic import synthetic_eye_batch

    # native 400x640 frames: the ellipse axes are in native pixels, so
    # tiny frames clip the sclera and degenerate the geometry
    imgs, segs, users, gaze = synthetic_eye_batch(16, seed=5, gaze=True)
    assert gaze.shape == (16, 3)
    np.testing.assert_allclose(np.linalg.norm(gaze, axis=1), 1.0, atol=1e-5)
    assert (gaze[:, 2] < 0).all()

    # iris-centroid offset from the eye (sclera) centroid tracks gaze x/y
    for i in range(16):
        ys, xs = np.nonzero(segs[i] >= 2)
        sy, sx = np.nonzero(segs[i] >= 1)
        dx, dy = xs.mean() - sx.mean(), ys.mean() - sy.mean()
        if abs(gaze[i, 0]) > 0.1:
            assert np.sign(dx) == np.sign(gaze[i, 0]), i
        if abs(gaze[i, 1]) > 0.1:
            assert np.sign(dy) == np.sign(gaze[i, 1]), i

    # gaze=False output unchanged by the feature's existence
    a = synthetic_eye_batch(4, height=64, width=64, seed=9)
    b = synthetic_eye_batch(4, height=64, width=64, seed=9, gaze=False)
    np.testing.assert_array_equal(a[0], b[0])


@pytest.fixture()
def fake_openeds2020_large(tmp_path):
    """A 550-frame train split (11 sequences x 50 frames) with each frame's
    id steganographed into its first two pixels — the round-2 VERDICT #3
    'fake 550-frame split' for the bounded-memory streaming-training test."""
    base = tmp_path / "gaze"
    rng = np.random.default_rng(7)
    fid = 0
    for seq in range(11):
        sd = base / "train" / "sequences" / f"{seq:04d}"
        sd.mkdir(parents=True)
        rows = []
        for i in range(50):
            arr = rng.integers(0, 255, (8, 8), dtype=np.uint8)
            arr[0, 0] = fid // 256
            arr[0, 1] = fid % 256
            Image.fromarray(arr, "L").save(sd / f"{i:03d}.png")
            rows.append(f"{i},{fid / 550:.6f},0.0,1.0")
            fid += 1
        ld = base / "train" / "labels"
        ld.mkdir(parents=True, exist_ok=True)
        (ld / f"{seq:04d}.txt").write_text("\n".join(rows))
    return str(base) + "/"


def _frame_ids(imgs):
    if imgs.dtype == np.uint8:  # streams now yield native 8-bit frames
        hi = imgs[:, 0, 0, 0].astype(int)
        lo = imgs[:, 0, 1, 0].astype(int)
    else:
        hi = np.rint(imgs[:, 0, 0, 0] * 255).astype(int)
        lo = np.rint(imgs[:, 0, 1, 0] * 255).astype(int)
    return hi * 256 + lo


def test_stream_shuffled_bounded_two_epochs(fake_openeds2020_large):
    """Estimator-2 raw-image training path (VERDICT r2 #3): two epochs of
    the epoch-reshuffled stream visit every frame exactly once per epoch,
    in different orders, while the host buffer stays O(batches + one
    sequence) — never the whole split."""
    import optax

    bs, n_total, seq_len, buffer_batches = 50, 550, 50, 4
    w = np.zeros((64,), np.float32)
    opt = optax.sgd(1e-2)
    opt_state = opt.init(w)
    orders = []
    for epoch in range(2):
        stats = {}
        seen = []
        for imgs, labs, valid in stream_openeds2020(
            fake_openeds2020_large, "train/", batch_size=bs,
            shuffle_seed=42 + epoch, drop_remainder=True,
            buffer_batches=buffer_batches, stats=stats,
        ):
            assert valid.all()
            seen.append(_frame_ids(imgs))
            # a real (tiny) train step, proving the loop trains end to end
            # (dequantize exactly as the consuming programs do:
            # ops.image.to_unit_float)
            x = imgs.reshape(bs, -1).astype(np.float32) / 255.0
            y = labs[:, 0]
            grads = 2 * x.T @ (x @ w - y) / bs
            updates, opt_state = opt.update(grads, opt_state)
            w = np.asarray(optax.apply_updates(w, updates))
        seen = np.concatenate(seen)
        # every frame visited exactly once this epoch
        assert sorted(seen.tolist()) == list(range(n_total))
        orders.append(seen)
        # memory bound: shuffle buffer + one decoded sequence, not the split
        bound = buffer_batches * bs + seq_len + bs
        assert stats["peak_buffer_frames"] <= bound < n_total
    # epochs reshuffle: different visit order
    assert not np.array_equal(orders[0], orders[1])
    assert np.isfinite(w).all() and np.abs(w).sum() > 0
