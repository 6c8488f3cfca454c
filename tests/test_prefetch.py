import numpy as np

from mopoe_mimic_tpu.parallel.mesh import make_mesh
from mopoe_mimic_tpu.parallel.prefetch import prefetch_to_device


def test_prefetch_preserves_order_and_places_on_device():
    mesh = make_mesh()
    batches = [({"x": np.full((8, 2), i, np.float32)}, np.full((8,), i)) for i in range(5)]
    out = list(prefetch_to_device(iter(batches), mesh, size=2))
    assert len(out) == 5
    for i, (batch, labels) in enumerate(out):
        assert float(np.asarray(batch["x"])[0, 0]) == i
        assert labels[0] == i
        assert hasattr(batch["x"], "sharding")


def test_prefetch_empty_iterator():
    mesh = make_mesh()
    assert list(prefetch_to_device(iter([]), mesh)) == []
