from .checkpoint import load_params, save_params
