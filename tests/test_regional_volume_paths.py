"""Path parity for q_regional_volume: the guarded broadcast FAST path and the
tagged-union co-partition SCALE path must emit identical integer aggregates —
the gate only ever exercises the fast path (15k orders << 2M bound), so this
pins the fallback against rot."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _rows(ds):
    return sorted(tuple(sorted(r.items())) for r in ds.take_all())


def test_regional_volume_fast_and_scale_paths_agree(ray_session):
    from document_processor_ray.pipelines.queries import q_regional_volume

    fast = _rows(q_regional_volume(SF))
    scale = _rows(q_regional_volume(SF, broadcast_orders_max=0))
    assert fast == scale
    assert len(fast) > 0
