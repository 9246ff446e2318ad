from lwm_tpu.utils.dtypes import float_tensor_to_dtype, get_float_dtype_by_name
from lwm_tpu.utils.flags import (
    define_flags_with_default,
    flatten_config_dict,
    function_args_to_config,
    get_user_flags,
    print_flags,
    user_flags_to_config_dict,
)
from lwm_tpu.utils.io import check_exists, load_pickle, open_file, save_pickle
from lwm_tpu.utils.losses import (
    average_metrics,
    cross_entropy_loss_and_accuracy,
    global_norm,
)
from lwm_tpu.utils.rng import JaxRNG, init_rng, next_rng, set_random_seed
