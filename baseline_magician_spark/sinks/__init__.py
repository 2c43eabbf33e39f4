from .hostgroups import (  # noqa: F401
    BAN_SETTINGS_DEFAULTS,
    HostgroupSink,
    hostgroup_rows,
)
