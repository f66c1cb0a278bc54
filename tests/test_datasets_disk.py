"""Dataset integration with real files on disk: Subjects-200K layout (globs,
sidecar descriptions, test split, on-the-fly canny), MultiGen jsonl layout,
multi-condition stacking."""

import json
import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from unigen_tpu.data.datasets import (MultiConditionSubjects200K, MultiGen,
                                      Subjects200K, collate)


def _img(path, color, size=(32, 32)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.zeros((size[1], size[0], 3), np.uint8)
    arr[..., :] = color
    arr[8:24, 8:24] = 255 - np.asarray(color)  # structure for canny
    Image.fromarray(arr).save(path)


@pytest.fixture(scope="module")
def subjects_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("subjects200k"))
    for i in range(4):
        base = os.path.join(root, "score_5", f"item{i:03d}")
        _img(f"{base}_target_0.jpg", (10 * i, 50, 100))
        _img(f"{base}_depth_large_0.jpg", (100, 10 * i, 50))
        _img(f"{base}_subject_0.jpg", (50, 100, 10 * i))
        _img(f"{base}_openpose_0.jpg", (10 * i, 10 * i, 10 * i))
        with open(f"{base}_target_0.json", "w") as f:
            json.dump({"description": f"item {i}"}, f)
    os.makedirs(os.path.join(root, "test_infos"), exist_ok=True)
    with open(os.path.join(root, "test_infos", "depth_subject_pose.txt"), "w") as f:
        f.write("item003_target_0.jpg\n")
    return root


def test_subjects200k_train_and_test_split(subjects_root):
    train = Subjects200K(subjects_root, "depth", resolution=16, split="train")
    test = Subjects200K(subjects_root, "depth", resolution=16, split="test")
    assert len(train) == 3 and len(test) == 1
    s = train[0]
    assert s["pixel_values"].shape == (3, 16, 16)
    assert s["condition_pixels"].shape == (3, 16, 16)
    assert s["task_names"] == "depth"
    t = test[0]
    assert t["target_image"].shape == (16, 16, 3)
    assert t["condition_image"].shape == (16, 16, 3)
    assert t["descriptions"] == "item 3"


def test_subjects200k_canny_on_the_fly(subjects_root):
    ds = Subjects200K(subjects_root, "canny", resolution=32, split="train")
    s = ds[0]
    cond = s["condition_pixels"]
    vals = np.unique(((cond + 1) * 127.5).round())
    assert set(vals.tolist()) <= {0.0, 255.0}  # binary edge map


def test_multi_condition_dataset(subjects_root):
    ds = MultiConditionSubjects200K(subjects_root,
                                    condition_types=("depth", "canny"),
                                    resolution=16)
    s = ds[0]
    assert "depth" in s and "canny" in s
    batch = collate([ds[0], ds[1]], condition_types=("depth", "canny"))
    assert batch["condition_pixels"].shape == (2, 2, 3, 16, 16)  # [K, B, ...]
    assert batch["pixel_values"].shape == (2, 3, 16, 16)


def test_multigen_jsonl(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "json_files"), exist_ok=True)
    recs = []
    for i in range(5):
        _img(os.path.join(root, f"img/{i}_t.jpg"), (20 * i, 40, 90))
        _img(os.path.join(root, f"img/{i}_s.jpg"), (90, 20 * i, 40))
        recs.append({"image": f"img/{i}_t.jpg", "source": f"img/{i}_s.jpg",
                     "prompt": f"p{i}"})
    with open(os.path.join(root, "json_files",
                           "aesthetics_plus_all_group_canny_all.json"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in recs))
    train = MultiGen(root, "canny", resolution=16, split="train")
    test = MultiGen(root, "canny", resolution=16, split="test")
    assert len(train) == 4 and len(test) == 1  # 80/20
    s = train[1]
    assert s["pixel_values"].shape == (3, 16, 16)
    assert s["condition_pixels"].shape == (3, 16, 16)
    assert s["task_names"] == "canny"
    # deterministic per (seed, index)
    s2 = MultiGen(root, "canny", resolution=16, split="train")[1]
    np.testing.assert_array_equal(s["pixel_values"], s2["pixel_values"])


def test_multigen_reference_record_layout(tmp_path):
    """Real MultiGen-20M record semantics: 'source' is the TARGET under
    images/, 'control_{task}' names the condition under conditions/group_*."""
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "json_files"), exist_ok=True)
    recs = []
    for i in range(5):
        _img(os.path.join(root, "images", f"pics/{i}.jpg"), (20 * i, 40, 90),
             size=(48, 32))
        _img(os.path.join(root, "conditions", f"group_0_{i}.jpg"),
             (90, 20 * i, 40), size=(48, 32))
        recs.append({"source": f"./pics/{i}.jpg",
                     "control_canny": f"whatever_group_0_{i}.jpg",
                     "prompt": f"p{i}"})
    with open(os.path.join(root, "json_files",
                           "aesthetics_plus_all_group_canny_all.json"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in recs))
    ds = MultiGen(root, "canny", resolution=16, split="train")
    s = ds[0]
    assert s["pixel_values"].shape == (3, 16, 16)
    assert s["task_names"] == "canny"
    assert s["descriptions"] == "p0"  # MultiGen prompt dropout OFF (ref :115)


def test_multigen_crop_parity_vs_reference_port():
    """resize_image_control/target vs an independent numpy port of the
    reference's crop math (dataloader.py:37-67): same rng -> identical crop
    windows and identical pixels."""
    import random as pyrandom
    import cv2
    from unigen_tpu.data.datasets import (resize_image_control,
                                          resize_image_target)

    rng1 = pyrandom.Random(123)
    rng2 = pyrandom.Random(123)
    r = np.random.default_rng(0)
    control = r.integers(0, 255, (40, 64, 3), dtype=np.uint8)   # W > H
    target = r.integers(0, 255, (80, 128, 3), dtype=np.uint8)   # 2x dims
    res = 48  # upscales from crop 40 -> LANCZOS4 (k = 48/40 > 1)

    got_c, rates = resize_image_control(control, res, rng1)
    got_t = resize_image_target(target, res, rates)

    # independent port of the reference math
    H, W = control.shape[:2]
    crop = H
    crop_l = rng2.randint(0, W - crop)
    ref_c = cv2.resize(control[0:H, crop_l:crop_l + crop], (res, res),
                       interpolation=cv2.INTER_LANCZOS4)
    exp_rates = (0.0, 1.0, crop_l / W, (crop_l + crop) / W)
    H2, W2 = target.shape[:2]
    t, b = int(exp_rates[0] * H2), int(exp_rates[1] * H2)
    l, rr = int(exp_rates[2] * W2), int(exp_rates[3] * W2)
    # k is computed from EACH image's own pre-crop dims: 48/80 < 1 -> AREA
    ref_t = cv2.resize(target[t:b, l:rr], (res, res),
                       interpolation=cv2.INTER_AREA)

    assert rates == pytest.approx(exp_rates)
    np.testing.assert_array_equal(got_c, ref_c)
    np.testing.assert_array_equal(got_t, ref_t)

    # downscale branch picks AREA (k < 1)
    big = r.integers(0, 255, (600, 400, 3), dtype=np.uint8)
    got_big, _ = resize_image_control(big, 128, pyrandom.Random(7))
    rng3 = pyrandom.Random(7)
    top = rng3.randint(0, 600 - 400)
    ref_big = cv2.resize(big[top:top + 400, 0:400], (128, 128),
                         interpolation=cv2.INTER_AREA)
    np.testing.assert_array_equal(got_big, ref_big)
