from .framed_conv import framed_conv1d_pallas
