from .sharding import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicated,
    shard_batch,
    pad_to_multiple,
)
from .distributed import (  # noqa: F401
    global_mesh,
    host_local_batch_to_global,
    initialize,
    is_coordinator,
    process_local_rows,
)
