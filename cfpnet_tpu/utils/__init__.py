from .vis import colorize
