from morphik_core_tpu.ee.connectors.base import (  # noqa: F401
    BaseConnector,
    ConnectorAuthStatus,
    ConnectorFile,
)
from morphik_core_tpu.ee.connectors.registry import get_connector  # noqa: F401
