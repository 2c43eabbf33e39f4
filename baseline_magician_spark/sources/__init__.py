from .external import register_external_table  # noqa: F401
from .networks import (  # noqa: F401
    fetch_current_hostgroups,
    fetch_networks_list,
    networks_from_cli,
)
from .rest import HttpTransport, RestError, Transport, urllib_transport  # noqa: F401
