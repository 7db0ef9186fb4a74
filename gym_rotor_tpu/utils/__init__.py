from .config import Config, config_from_args, create_parser

__all__ = ["Config", "config_from_args", "create_parser"]
