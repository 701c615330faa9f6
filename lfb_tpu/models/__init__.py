from lfb_tpu.models.spec import ModelSpec, build_spec
from lfb_tpu.models.model import init_params, forward
