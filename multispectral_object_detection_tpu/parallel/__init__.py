from .mesh import (make_mesh, batch_sharding, param_shardings,  # noqa: F401
                   make_parallel_train_step)
