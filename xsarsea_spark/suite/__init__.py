"""Query suite: importing this package registers every QuerySpec.

Each submodule registers (Spark, oracle-SQL) pairs into
``xsarsea_spark.suite.base.REGISTRY`` at import time.
"""

from xsarsea_spark.suite.base import REGISTRY, QuerySpec, spec  # noqa: F401

# Import for side effect: populate REGISTRY.
from xsarsea_spark.suite import relational  # noqa: F401,E402
from xsarsea_spark.suite import relational_ext  # noqa: F401,E402
from xsarsea_spark.suite import relational_full  # noqa: F401,E402
from xsarsea_spark.suite import science  # noqa: F401,E402
from xsarsea_spark.suite import streaks  # noqa: F401,E402
from xsarsea_spark.suite import pipeline_suite  # noqa: F401,E402
from xsarsea_spark.suite import events_suite  # noqa: F401,E402
from xsarsea_spark.suite import catalog_suite  # noqa: F401,E402
from xsarsea_spark.suite import raster  # noqa: F401,E402

__all__ = ["REGISTRY", "QuerySpec", "spec"]
