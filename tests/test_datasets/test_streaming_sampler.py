"""GroupStreamingSampler: lanes stay scene-contiguous and flag scene
starts."""
from tpu_bev3d.datasets.samplers import GroupStreamingSampler


def test_streaming_lanes_contiguous():
    # 3 scenes of lengths 4, 3, 5 → 12 samples
    scene_ids = ['a'] * 4 + ['b'] * 3 + ['c'] * 5
    s = GroupStreamingSampler(scene_ids, batch_size=2, shuffle=False)
    batches = list(s)
    assert len(batches) == len(s) > 0
    # within each lane, consecutive indices belong to the same scene unless
    # flagged as a scene start
    for lane in range(2):
        prev = None
        for t, (idxs, first) in enumerate(batches):
            cur = scene_ids[idxs[lane]]
            if prev is not None and not first[lane]:
                assert cur == prev
            prev = cur
    # every scene start flagged
    starts = sum(sum(f) for _, f in batches)
    assert starts >= 2  # at least the first frame of each active lane
