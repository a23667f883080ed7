from .vis import colorize, unnormalize
