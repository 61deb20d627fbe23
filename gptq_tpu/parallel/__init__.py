from gptq_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_params,
    sharding_rules,
)

# heavier strategy modules (tp, pp, sp, ep, distributed) import lazily at
# use sites; re-export the common entry points for discoverability
from gptq_tpu.parallel.tp import (  # noqa: F401
    make_tp_decode_step,
    make_tp_forward,
)
from gptq_tpu.parallel.pp import (  # noqa: F401
    make_pp_eval,
    make_pp_mesh,
    make_pp_train_step,
    stack_stage_params,
    unstack_stage_params,
)
from gptq_tpu.parallel.sp import (  # noqa: F401
    SPCache,
    make_sp_cache_prefill,
    make_sp_decode_step,
    make_sp_mesh,
    make_sp_prefill,
    make_sp_tp_cache_prefill,
    make_sp_tp_decode_step,
    make_sp_tp_mesh,
    make_sp_tp_prefill,
)
from gptq_tpu.parallel.ep import (  # noqa: F401
    make_ep_decode_step,
    make_ep_forward,
    make_ep_mesh,
    make_ep_tp_forward,
)
