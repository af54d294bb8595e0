"""GroupFeeder semantics: step masks, partial batches, epoch reshuffling,
debug truncation, augmentation shapes (pure host logic, no jit)."""

import numpy as np

from fedcola_tpu.data.datasets import fetch_synthetic
from fedcola_tpu.data.pipeline import (AugmentSpec, ClientShard, GroupFeeder,
                                       Prefetcher)


def _shards():
    ds = fetch_synthetic("MedicalAbstracts", "txt", "cls", 100, 5,
                         seq_len=8, vocab_size=50, seed=0)
    return [ClientShard(ds, np.arange(0, 37)),      # 37 samples
            ClientShard(ds, np.arange(37, 100))]    # 63 samples


def test_step_and_sample_masks():
    feeder = GroupFeeder(_shards(), B=10, modality="txt", chunk_steps=3,
                         shuffle=False)
    # client 0: ceil(37/10)=4 steps (last batch 7 valid)
    # client 1: ceil(63/10)=7 steps (last batch 3 valid) -> max_steps 7
    assert list(feeder.steps_per_client) == [4, 7]
    chunks = list(feeder.epoch_chunks())
    assert sum(c["step_valid"].shape[1] for c in chunks) == 7
    sv = np.concatenate([c["step_valid"] for c in chunks], axis=1)
    assert sv[0].tolist() == [True] * 4 + [False] * 3
    assert sv[1].tolist() == [True] * 7
    valid = np.concatenate([c["valid"] for c in chunks], axis=1)
    assert valid[0, 3].sum() == 7      # client 0 partial last batch
    assert valid[1, 6].sum() == 3      # client 1 partial last batch
    assert valid[0, 4:].sum() == 0     # padded steps fully masked
    # every valid sample appears exactly once
    xs = np.concatenate([c["x"] for c in chunks], axis=1)
    seen = xs[0][valid[0]]
    assert len(np.unique(seen, axis=0)) == 37


def test_epochs_reshuffle():
    feeder = GroupFeeder(_shards(), B=10, modality="txt", chunk_steps=8,
                         shuffle=True, rng=np.random.RandomState(0))
    e1 = np.concatenate([c["x"][1][c["valid"][1]][None]
                         for c in feeder.epoch_chunks()], axis=0)
    e2 = np.concatenate([c["x"][1][c["valid"][1]][None]
                         for c in feeder.epoch_chunks()], axis=0)
    assert not np.array_equal(e1, e2)              # different order
    assert np.array_equal(np.sort(e1.reshape(-1, 8), axis=0),
                          np.sort(e2.reshape(-1, 8), axis=0))  # same set


def test_debug_two_batches():
    """--debug truncates every client to 2 steps (fedavgclient.py:73-75)."""
    feeder = GroupFeeder(_shards(), B=10, modality="txt", chunk_steps=8,
                         debug_two_batches=True)
    assert list(feeder.steps_per_client) == [2, 2]


def test_full_batch_B0():
    """B=0 -> full-batch training (main.py:263)."""
    feeder = GroupFeeder(_shards(), B=0, modality="txt", chunk_steps=4)
    assert feeder.B == 63
    assert list(feeder.steps_per_client) == [1, 1]


def test_augmentation_shapes_and_determinism():
    ds = fetch_synthetic("CIFAR100", "img", "cls", 40, 10, img_hw=32, seed=1)
    shards = [ClientShard(ds, np.arange(40))]
    aug = AugmentSpec(crop=32, randhf=0.5)
    feeder = GroupFeeder(shards, B=8, modality="img", chunk_steps=8,
                         shuffle=False, rng=np.random.RandomState(3),
                         aug=aug)
    chunk = next(iter(feeder.epoch_chunks()))
    # 5 real steps, tail bucketed up to chunk_steps=8 (fixed program shapes)
    assert chunk["x"].shape == (1, 8, 8, 32, 32, 3)
    assert chunk["x"].dtype == np.uint8
    assert chunk["step_valid"][0].tolist() == [True] * 5 + [False] * 3
    assert not chunk["valid"][0, 5:].any()


def test_rotation_matches_pil_nearest():
    """randrot parity: bit-exact vs PIL rotate(angle, NEAREST) — the
    backend torchvision's RandomRotation uses (reference data.py:99)."""
    from PIL import Image
    from fedcola_tpu.data.pipeline import _rotate_nearest
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    for a in (10.0, -25.0, 37.5, 180.0):
        ref = np.asarray(Image.fromarray(img).rotate(a, resample=Image.NEAREST))
        np.testing.assert_array_equal(_rotate_nearest(img, a), ref, str(a))


def test_color_jitter_semantics():
    """randjit parity: brightness/contrast blends match PIL ImageEnhance
    within 1 uint8 step; factor range is U(max(0,1-j), 1+j); zeros-jitter
    is identity."""
    from PIL import Image, ImageEnhance
    from fedcola_tpu.data.pipeline import _color_jitter
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    x = img.astype(np.float32)
    for f in (0.6, 1.0, 1.4):
        pb = np.asarray(ImageEnhance.Brightness(Image.fromarray(img)).enhance(f))
        ob = np.clip(np.round(x * f), 0, 255)
        assert np.abs(pb.astype(int) - ob.astype(int)).max() <= 1, f
        pc = np.asarray(ImageEnhance.Contrast(Image.fromarray(img)).enhance(f))
        gray = (x[..., 0] * 299 + x[..., 1] * 587 + x[..., 2] * 114) / 1000
        mean = np.floor(gray.mean() + 0.5)
        oc = np.clip(np.round(x * f + mean * (1 - f)), 0, 255)
        assert np.abs(pc.astype(int) - oc.astype(int)).max() <= 1, f
    # sampled factors stay in torchvision's range: j=0.5 -> factors in [.5,1.5]
    out = _color_jitter(np.full((8, 8, 3), 128, np.uint8), 0.5,
                        np.random.RandomState(2))
    assert out.min() >= 255 * 0.2 and out.shape == (8, 8, 3)


def test_augment_order_and_flags():
    """The full _augment chain applies crop->rot->flips->jitter (the
    reference Compose order, data.py:95-105) and changes pixels."""
    ds = fetch_synthetic("CIFAR100", "img", "cls", 16, 10, img_hw=32, seed=2)
    shards = [ClientShard(ds, np.arange(16))]
    aug = AugmentSpec(crop=32, randrot=15, randhf=0.5, randvf=0.5,
                      randjit=0.4)
    assert aug.active
    feeder = GroupFeeder(shards, B=8, modality="img", chunk_steps=8,
                         shuffle=False, rng=np.random.RandomState(3),
                         aug=aug)
    chunk = next(iter(feeder.epoch_chunks()))
    assert chunk["x"].shape == (1, 2, 8, 32, 32, 3)
    assert chunk["x"].dtype == np.uint8
    assert not np.array_equal(chunk["x"][0, 0],
                              ds.images[:8])  # actually augmented


def test_prefetcher_preserves_order():
    items = list(range(20))
    assert list(Prefetcher(iter(items))) == items


def test_prefetcher_propagates_feeder_exceptions():
    """A feeder crash must abort the consumer, not truncate the epoch."""
    def gen():
        yield 1
        yield 2
        raise ValueError("decode failed")

    pf = Prefetcher(gen())
    got = []
    import pytest
    with pytest.raises(ValueError, match="decode failed"):
        for item in pf:
            got.append(item)
    assert got == [1, 2]
    assert not pf.thread.is_alive()


def test_round_index_chunks_match_gathered_chunks():
    """The HBM-resident index plane must describe exactly the same batches
    as the gathered plane: images[idx] == x, same masks, same epoch
    streaming."""
    ds = fetch_synthetic("CIFAR100", "img", "cls", 50, 10, img_hw=8, seed=2)
    mk = lambda: GroupFeeder(
        [ClientShard(ds, np.arange(30)), ClientShard(ds, np.arange(30, 50))],
        B=8, modality="img", chunk_steps=4, shuffle=True,
        rng=np.random.RandomState(7))
    gathered = list(mk().round_chunks(2))
    indexed = list(mk().round_index_chunks(2))
    assert len(gathered) == len(indexed)
    for g, ix in zip(gathered, indexed):
        np.testing.assert_array_equal(g["step_valid"], ix["step_valid"])
        np.testing.assert_array_equal(g["valid"], ix["valid"])
        np.testing.assert_array_equal(
            g["x"][ix["valid"]], ds.images[ix["idx"]][ix["valid"]])
        np.testing.assert_array_equal(
            g["y"][ix["valid"]],
            ds.targets[ix["idx"]][ix["valid"]].astype(np.int32))


def test_augment_resize_before_crop_matches_torchvision():
    """--resize + --crop: the reference resizes BEFORE RandomCrop
    (data.py:93-97).  With resize=16 and crop=24 the padded image is
    exactly crop-sized, so the random crop has ONE position and the whole
    chain is deterministic — compare bit-exactly."""
    import numpy as np
    from fedcola_tpu.data.pipeline import AugmentSpec, _augment

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (3, 32, 32, 3), dtype=np.uint8)
    aug = AugmentSpec(resize=16, crop=24)
    ours = _augment(imgs.copy(), aug, np.random.RandomState(1))
    assert ours.shape == (3, 24, 24, 3)

    # hand-built PIL math (= torchvision's for this configuration;
    # torchvision itself is not in this image): resize then pad-4 on all
    # sides makes the image exactly crop-sized, so crop = identity
    from PIL import Image
    ref = []
    for im in imgs:
        r = np.asarray(Image.fromarray(im).resize((16, 16), Image.BILINEAR))
        ref.append(np.pad(r, ((4, 4), (4, 4), (0, 0))))
    np.testing.assert_array_equal(ours, np.stack(ref))


def test_augment_pad_if_needed_no_resize():
    """crop larger than native+8 pads instead of crashing (torchvision
    pad_if_needed=True, data.py:96)."""
    import numpy as np
    from fedcola_tpu.data.pipeline import AugmentSpec, _augment

    imgs = np.full((2, 8, 8, 3), 200, dtype=np.uint8)
    out = _augment(imgs, AugmentSpec(crop=32), np.random.RandomState(0))
    assert out.shape == (2, 32, 32, 3)
    assert (out == 200).any() and (out == 0).any()   # content + padding
