"""Parameter sharding rules for 2-D (data x model) meshes.

The reference has no parallelism at all and these models are small enough
that pure data parallelism is optimal (SURVEY.md §2.6) — but the framework
supports Megatron-style tensor parallelism over a `model` mesh axis for the
transformer blocks, useful when scaling the fusion/wav2vec encoders up:

- attention qkv kernel: column-parallel  (E, 3E) -> P(None, 'model')
- attention out kernel: row-parallel     (E, E)  -> P('model', None)
- MLP linear1: column-parallel           (E, F)  -> P(None, 'model')
- MLP linear2: row-parallel              (F, E)  -> P('model', None)
- matching biases sharded with their output dim; everything else replicated.

Under jit/GSPMD, placing parameters with these NamedShardings is sufficient:
XLA partitions the matmuls and inserts the reduce-scatter/all-reduce pairs
over ICI automatically — numerics match the replicated run (tested on the
virtual mesh).
"""

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import jax

_COLUMN_KERNELS = ("in_proj_kernel", )
_ROW_KERNELS = ("out_proj_kernel", )


def _spec_for(path_names, leaf, model_axis):
    name = path_names[-1]
    parent = path_names[-2] if len(path_names) > 1 else ""
    if name == "in_proj_kernel" or (parent == "linear1" and name == "kernel"):
        return P(None, model_axis)          # column parallel
    if name == "out_proj_kernel" or (parent == "linear2" and name == "kernel"):
        return P(model_axis, None)          # row parallel
    if name == "in_proj_bias" or (parent == "linear1" and name == "bias"):
        return P(model_axis)
    return P()                               # replicated


def transformer_tp_shardings(params, mesh: Mesh, model_axis: str = "model"):
    """NamedSharding pytree for `params` applying the rules above.

    Leaves whose sharded dimension does not divide the mesh axis size fall
    back to replication (e.g. per-class heads).
    """
    axis_size = mesh.shape[model_axis]

    def assign(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        spec = _spec_for(names, leaf, model_axis)
        for dim, part in enumerate(spec):
            if part is not None and (dim >= leaf.ndim
                                     or leaf.shape[dim] % axis_size != 0):
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)


def place_params(params, mesh: Mesh, model_axis: str = "model"):
    """device_put params with TP shardings (replicated where rules skip)."""
    shardings = transformer_tp_shardings(params, mesh, model_axis)
    return jax.tree.map(jax.device_put, params, shardings)


def place_state_for_tp(state, mesh: Mesh, model_axis: str = "model"):
    """Place a full TrainState for dp x tp training: everything replicated
    over the mesh, then params (and their mirrors) Megatron-sharded on the
    model axis.  Optimizer-state subtrees that structurally match the
    params pytree (Adam's mu/nu, MultiSteps accumulators, EMA shadows) get
    the SAME shardings — so moment buffers live sharded instead of being
    resharded by XLA every step."""
    replicated = NamedSharding(mesh, P())
    state = jax.device_put(state, replicated)
    shardings = transformer_tp_shardings(state.params, mesh, model_axis)
    pdef = jax.tree_util.tree_structure(state.params)

    def place_like_params(tree):
        return jax.tree.map(jax.device_put, tree, shardings)

    def walk(node):
        if jax.tree_util.tree_structure(node) == pdef:
            return place_like_params(node)
        if isinstance(node, tuple):
            vals = [walk(v) for v in node]
            return (type(node)(*vals) if hasattr(node, "_fields")
                    else tuple(vals))
        if isinstance(node, list):
            return [walk(v) for v in node]
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return state.replace(
        params=place_like_params(state.params),
        opt_state=walk(state.opt_state),
        ema_params=(None if state.ema_params is None
                    else place_like_params(state.ema_params)))
