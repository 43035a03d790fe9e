from .config import CfgNode, load_yaml_with_base
from .defaults import add_wsovod_config, get_cfg

__all__ = ["CfgNode", "load_yaml_with_base", "get_cfg", "add_wsovod_config"]
