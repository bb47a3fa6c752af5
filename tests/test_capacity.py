"""Static-capacity sizing: the flagship caps must hold real occupancy.

The engines drop sites past their static caps silently (documented),
which is only acceptable when the caps exceed realistic occupancy.
Stride-2 site generation DILATES the active set (each input touches up
to 8 output cells), so later stages need more slots than stage 1 — a
regression here means flagship-scale numerics silently diverge from the
reference, which never caps.  tools/size_caps.py is the sizing tool;
this test pins its result for one realistic 80k-point cloud against the
shipped defaults."""
import numpy as np

from streamingflow_tpu.config import Config


def test_flagship_caps_fit_realistic_cloud():
    import tools.size_caps as SC

    cfg = Config()
    se = cfg.MODEL.SPARSE_ENCODER
    from streamingflow_tpu.data.synthetic import _lidar_like_clouds
    rng = np.random.RandomState(7)
    cloud = _lidar_like_clouds(rng, (1,), 80000, se.POINT_CLOUD_RANGE)[0]
    rows = SC.stage_occupancy(cloud, cfg)
    for i, (sites, tiles, cols) in enumerate(rows):
        assert sites <= se.STAGE_CAPS[i], \
            f'stage {i + 1}: {sites} sites > cap {se.STAGE_CAPS[i]}'
        assert tiles <= se.TILE_CAPS[i], \
            f'stage {i + 1}: {tiles} tiles > cap {se.TILE_CAPS[i]}'
        assert cols <= se.COLUMN_CAPS[i], \
            f'stage {i + 1}: {cols} columns > cap {se.COLUMN_CAPS[i]}'
        # caps should not be wildly oversized either (memory is linear
        # in them) — at least 40% fill on the site caps
        assert sites >= 0.4 * se.STAGE_CAPS[i], \
            f'stage {i + 1}: cap {se.STAGE_CAPS[i]} oversized for {sites}'
