"""COCO compressed-RLE codec (tpu_bev3d/utils/rle.py) — devkit-free
replacement for pycocotools encode/decode + nuImages base64 wrapper
(ref: tools/dataset_converters/nuimage_converter.py:95,131)."""
import numpy as np

from tpu_bev3d.utils.rle import (mask_decode, mask_encode, rle_decode,
                                 rle_encode)


def test_hand_computed_tiny_case():
    # 3x2 mask, column-major flat = [0,1,1,0,0,1] → counts [1,2,2,1]
    m = np.array([[0, 0], [1, 0], [1, 1]], np.uint8)
    rle = rle_encode(m)
    assert rle['size'] == [3, 2]
    # LEB128-5bit chars: 1→'1', 2→'2', delta(2-1)=1→'1', delta(1-2)=-1
    assert rle['counts'][:2] == '12'
    assert (rle_decode(rle) == m).all()


def test_roundtrip_random_masks():
    rng = np.random.default_rng(0)
    for _ in range(25):
        h, w = rng.integers(1, 64, 2)
        m = (rng.random((h, w)) < rng.random()).astype(np.uint8)
        assert (rle_decode(rle_encode(m)) == m).all()


def test_edge_cases():
    for m in (np.ones((6, 9), np.uint8), np.zeros((6, 9), np.uint8),
              np.eye(5, dtype=np.uint8), np.ones((1, 1), np.uint8)):
        assert (rle_decode(rle_encode(m)) == m).all()


def test_large_runs_use_multibyte_leb():
    # a 900x1600 mask forces counts > 2^5 (multi-char LEB128 path)
    m = np.zeros((900, 1600), np.uint8)
    m[100:400, 200:900] = 1
    assert (rle_decode(rle_encode(m)) == m).all()


def test_nuimages_base64_wrapper():
    rng = np.random.default_rng(1)
    m = (rng.random((90, 160)) < 0.2).astype(np.uint8)
    ann = mask_encode(m, b64=True)
    assert (mask_decode(ann) == m).all()
    # plain-counts RLE also accepted (post-conversion COCO form)
    assert (mask_decode(mask_encode(m)) == m).all()
