from .deltar import Deltar, make_model
