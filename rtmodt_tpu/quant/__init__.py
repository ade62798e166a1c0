from rtmodt_tpu.quant.ptq import (  # noqa: F401
    QuantConv,
    QuantizedModel,
    collect_act_scales,
    quantize_convs,
    quantize_model,
)
