"""Devkit-free COCO compressed-RLE mask codec.

nuImages stores instance masks as pycocotools compressed RLE with a
base64-encoded counts string (ref: tools/dataset_converters/
nuimage_converter.py:95,131 decodes them via nuimages.utils.mask_decode /
base64). This module reimplements the codec in pure numpy so the
converter and tests need no pycocotools/nuimages install.

Format (pycocotools common/maskApi.c rleToString/rleFrString):
- the binary mask is flattened COLUMN-major (Fortran order);
- counts alternate run lengths of 0s and 1s, starting with 0s;
- counts after index 2 are delta-encoded against the count two back;
- each (possibly negative) delta is written LEB128-style, 5 data bits
  per char, bit 0x20 = continuation, chars offset by 48 ('0'..'o').
"""
from __future__ import annotations

import base64
from typing import Union

import numpy as np

__all__ = ['rle_encode', 'rle_decode', 'mask_decode', 'mask_encode']


def _counts_to_string(cnts) -> str:
    s = []
    for i, c in enumerate(cnts):
        x = int(c)
        if i > 2:
            x -= int(cnts[i - 2])
        more = True
        while more:
            ch = x & 0x1F
            x >>= 5
            more = (x != -1) if (ch & 0x10) else (x != 0)
            if more:
                ch |= 0x20
            s.append(chr(ch + 48))
    return ''.join(s)


def _string_to_counts(s: str) -> np.ndarray:
    cnts = []
    p = 0
    n = len(s)
    while p < n:
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[p]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(cnts) > 2:
            x += cnts[-2]
        cnts.append(x)
    return np.asarray(cnts, np.int64)


def rle_encode(mask: np.ndarray) -> dict:
    """Binary mask [h, w] → COCO compressed RLE {'size', 'counts': str}."""
    h, w = mask.shape
    flat = np.asfortranarray(mask.astype(bool)).reshape(-1, order='F')
    flat = flat.astype(np.int8)
    change = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    cnts = np.diff(bounds)
    if flat.size and flat[0] == 1:          # counts must start with a 0-run
        cnts = np.concatenate([[0], cnts])
    return dict(size=[int(h), int(w)], counts=_counts_to_string(cnts))


def rle_decode(rle: dict) -> np.ndarray:
    """COCO compressed RLE {'size', 'counts': str} → binary mask [h, w]."""
    h, w = rle['size']
    counts = rle['counts']
    if isinstance(counts, bytes):
        counts = counts.decode()
    cnts = _string_to_counts(counts)
    vals = np.arange(len(cnts), dtype=np.int64) % 2       # 0-run, 1-run, ...
    flat = np.repeat(vals.astype(np.uint8), cnts)
    if flat.size < h * w:
        flat = np.concatenate([flat, np.zeros(h * w - flat.size, np.uint8)])
    return flat[:h * w].reshape((h, w), order='F')


def mask_decode(ann_mask: dict) -> np.ndarray:
    """nuImages object_ann['mask'] (base64 counts) → binary mask [h, w].

    Ref: nuimage_converter.py:131 — counts are base64-encoded bytes of
    the compressed-RLE string.
    """
    counts = ann_mask['counts']
    if isinstance(counts, str):
        try:
            counts = base64.b64decode(counts).decode()
        except Exception:
            pass                              # already a plain RLE string
    elif isinstance(counts, bytes):
        counts = counts.decode()
    return rle_decode(dict(size=ann_mask['size'], counts=counts))


def mask_encode(mask: np.ndarray,
                b64: bool = False) -> dict:
    """Binary mask → RLE dict; b64=True emits nuImages-style counts."""
    rle = rle_encode(mask)
    if b64:
        rle['counts'] = base64.b64encode(rle['counts'].encode()).decode()
    return rle
