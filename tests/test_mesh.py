"""Mesh construction + batch sharding on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from tvc.parallel import MeshConfig, create_mesh, data_sharding, shard_batch


def test_mesh_all_devices():
    mesh = create_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8
    assert mesh.axis_names == ("data",)


def test_mesh_shape_inference():
    cfg = MeshConfig(axes=("data", "model"), shape=(-1, 2))
    assert cfg.resolve_shape(8) == (4, 2)
    with pytest.raises(ValueError):
        MeshConfig(axes=("data",), shape=(3,)).resolve_shape(8)


def test_shard_batch_places_batch_dim():
    mesh = create_mesh()
    batch = {"img": np.zeros((16, 4, 4)), "txt": np.zeros((16, 7))}
    sharded = shard_batch(mesh, batch)
    for v in sharded.values():
        shard_shapes = {s.data.shape for s in v.addressable_shards}
        assert all(ss[0] == 2 for ss in shard_shapes)  # 16 / 8 devices


def test_data_sharding_spec():
    mesh = create_mesh()
    s = data_sharding(mesh, ndim=3)
    assert s.spec == jax.sharding.PartitionSpec("data", None, None)


def test_multihost_helpers():
    from tvc.parallel.mesh import host_local_batch, initialize_multihost

    n = initialize_multihost()  # single-process no-op
    assert n == 8
    assert host_local_batch(64) == 64  # one host -> identity
