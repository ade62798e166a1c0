from rtmodt_tpu.quant.ptq import (  # noqa: F401
    QuantConv,
    QuantizedModel,
    collect_act_scales,
    quantize_convs,
    quantize_model,
)
from rtmodt_tpu.quant.qat import (  # noqa: F401
    FakeQuantModel,
    make_qat_step,
    qat_finetune,
)
