from .torch_compat import torch_linear_init, torch_conv_init, uniform_fan_in
