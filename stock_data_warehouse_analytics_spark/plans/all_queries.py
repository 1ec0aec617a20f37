"""Import side-effect module: pulls in every query module so the
registry is fully populated.  ``registry.get_queries()`` imports this."""

from . import tpch_olap  # noqa: F401
from . import tpch_joins  # noqa: F401
from . import tpch_windows  # noqa: F401
from . import llm_text  # noqa: F401
from . import llm_dedup  # noqa: F401
from . import llm_similarity  # noqa: F401
from . import streaming_windows  # noqa: F401
from . import tpch_mining  # noqa: F401
from . import sql_api  # noqa: F401
from . import tpch_olap2  # noqa: F401
from . import tpch_misc  # noqa: F401
from . import joins_advanced  # noqa: F401
from . import llm_sampling  # noqa: F401
from . import behavioral  # noqa: F401
from . import llm_text2  # noqa: F401
from . import tpch_more  # noqa: F401
from . import sketches  # noqa: F401
from . import tpch_more2  # noqa: F401
from . import tpch_more3  # noqa: F401
from . import graph_iter  # noqa: F401
from . import llm_text3  # noqa: F401
from . import emb_iter  # noqa: F401
from . import warehouse_ops  # noqa: F401
