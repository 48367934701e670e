from muscle_tpu.convert.torch_to_flax import (
    convert_muscle_state_dict,
    convert_irn_state_dict,
    flax_to_muscle_state_dict,
    load_torch_checkpoint,
)
