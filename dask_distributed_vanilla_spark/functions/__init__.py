from dask_distributed_vanilla_spark.functions.dates import ts  # noqa: F401
from dask_distributed_vanilla_spark.functions.vector import cosine_sim, dot, l2_norm  # noqa: F401
