from tvc.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    MeshConfig,
    create_mesh,
    data_sharding,
    local_mesh_for_tests,
    pad_to_multiple,
    replicated,
    shard_batch,
)
from tvc.parallel.steps import (  # noqa: F401
    make_defense_step,
    make_serving_step,
    make_train_step,
)
