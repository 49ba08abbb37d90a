from .model import Model, I2IBaseModel, SoftmaxBaseModel, model_kwargs
from .register import (
    register_model, register_model_factory, register_model_alias,
    create_model, get_model_names, get_model_class,
)
from .io import (
    save_model, load_model, flatten_params, unflatten_params,
    merge_state_dict, mean_state_dict,
)

__all__ = [
    "Model", "I2IBaseModel", "SoftmaxBaseModel", "model_kwargs",
    "register_model", "register_model_factory", "register_model_alias",
    "create_model", "get_model_names", "get_model_class",
    "save_model", "load_model", "flatten_params", "unflatten_params",
    "merge_state_dict", "mean_state_dict",
]
