"""Agent registry: reference agent names -> TPU agent classes.

The reference resolves agents by config string via globals()
(main.py:48); here an explicit registry maps the same names.
"""

from protoasnet_tpu.train.agents.xprotonet import (  # noqa: F401
    XProtoNetE2EAgent,
    XProtoNetStagedAgent,
)
from protoasnet_tpu.train.agents.protopnet import (  # noqa: F401
    ProtoPNetStagedAgent,
    ProtoPNetE2EAgent,
)

AGENTS = {
    # reference names (config `agent:` keys)
    "Video_XProtoNet_e2e": XProtoNetE2EAgent,
    "XProtoNet_e2e": XProtoNetE2EAgent,
    "XProtoNet_Base": XProtoNetStagedAgent,
    "ProtoPNet_Base": ProtoPNetStagedAgent,
    "ProtoPNet_e2e": ProtoPNetE2EAgent,
}


def build_agent(config):
    name = config["agent"]
    if name not in AGENTS:
        raise ValueError(f"Unknown agent {name!r}; options: {sorted(AGENTS)}")
    return AGENTS[name](config)
