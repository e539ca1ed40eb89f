"""Text-prototxt ingestion: reference solver configs -> our typed configs.

The reference configures everything through protobuf text files; the QA
driver writes its `solver.prototxt` via `str(SolverParameter())`
(do_trec_qa_clean.py:322-348).  Migrating users carry those files, so
`qa train --solver-prototxt solver.prototxt` consumes them directly:
a small generic text-proto parser (the subset protobuf's text format
actually uses: `key: value` scalars, `key { ... }` nested messages,
repeated fields, '#' comments) plus a field map onto SolverConfig /
TrainerConfig (SolverParameter fields, caffe.proto:102-242; legacy enum
`solver_type: ADADELTA` and the modern `type: "AdaDelta"` both accepted,
upgrade_proto.cpp:937-1044's job).
"""

from __future__ import annotations

import re

_TOKEN = re.compile(r"""
    \s*(?:
        (?P<comment>\#[^\n]*)
      | (?P<brace_open>\{)
      | (?P<brace_close>\})
      | (?P<key>[A-Za-z_][A-Za-z0-9_]*)\s*(?P<colon>:)?
      | (?P<string>"(?:[^"\\]|\\.)*")
      | (?P<scalar>[^\s{}#]+)
    )""", re.VERBOSE)


def parse_prototxt(text: str) -> dict:
    """Protobuf text format -> nested dict; repeated fields -> lists."""
    pos = 0
    stack = [{}]
    pending_key = None
    n = len(text)

    def store(key, value):
        d = stack[-1]
        if key in d:
            if not isinstance(d[key], list):
                d[key] = [d[key]]
            d[key].append(value)
        else:
            d[key] = value

    while pos < n:
        m = _TOKEN.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip() == "":
                break
            raise ValueError(f"prototxt parse error at {text[pos:pos+40]!r}")
        pos = m.end()
        if m.group("comment"):
            continue
        if m.group("brace_open"):
            if pending_key is None:
                raise ValueError("'{' without a field name")
            child: dict = {}
            store(pending_key, child)
            stack.append(child)
            pending_key = None
        elif m.group("brace_close"):
            if len(stack) == 1:
                raise ValueError("unbalanced '}'")
            stack.pop()
        elif m.group("key") is not None:
            if pending_key is not None and not m.group("colon"):
                # bare identifier value: a bool or an enum (TRAIN, ADADELTA)
                word = m.group("key")
                store(pending_key,
                      {"true": True, "false": False}.get(word, word))
                pending_key = None
            else:
                pending_key = m.group("key")
        elif m.group("string") is not None:
            s = m.group("string")[1:-1]
            s = s.encode().decode("unicode_escape")
            store(pending_key, s)
            pending_key = None
        elif m.group("scalar") is not None:
            raw = m.group("scalar")
            try:
                value = int(raw)
            except ValueError:
                try:
                    value = float(raw)
                except ValueError:
                    value = {"true": True, "false": False}.get(raw, raw)
            store(pending_key, value)
            pending_key = None
    if len(stack) != 1:
        raise ValueError("unbalanced '{'")
    return stack[0]


# legacy SolverType enum (caffe.proto SolverParameter.SolverType) -> type
_LEGACY_TYPES = {"SGD": "sgd", "NESTEROV": "nesterov", "ADAGRAD": "adagrad",
                 "RMSPROP": "rmsprop", "ADADELTA": "adadelta",
                 "ADAM": "adam"}


def solver_config_from_prototxt(text: str):
    """solver.prototxt -> (SolverConfig, extras dict with the loop-level
    fields: max_iter/test_interval/snapshot/snapshot_prefix/random_seed/
    display)."""
    from ..training.optim import SolverConfig

    d = parse_prototxt(text)

    def last(key, default=None):
        v = d.get(key, default)
        return v[-1] if isinstance(v, list) else v

    t = last("type")
    if t is None and "solver_type" in d:
        t = _LEGACY_TYPES.get(str(last("solver_type")).upper())
    t = (t or "SGD").lower()
    if t not in ("sgd", "nesterov", "adagrad", "rmsprop", "adadelta",
                 "adam"):
        raise ValueError(f"unknown solver type {t!r}")
    stepvalues = d.get("stepvalue", ())
    if not isinstance(stepvalues, (list, tuple)):
        stepvalues = (stepvalues,)
    # defaults mirror SolverParameter's proto defaults exactly (fields
    # without a declared default read as 0/empty) so an omitted field
    # means the same thing it means to the reference -- e.g. momentum has
    # NO default, so absent momentum is 0, not some house value
    cfg = SolverConfig(
        solver_type=t,
        base_lr=float(last("base_lr", 0.0)),
        lr_policy=str(last("lr_policy", "fixed")),
        gamma=float(last("gamma", 0.0)),
        power=float(last("power", 0.0)),
        stepsize=int(last("stepsize", 0)),  # proto default 0, like the rest
        stepvalues=tuple(int(v) for v in stepvalues),
        max_iter=int(last("max_iter", 40001)),
        momentum=float(last("momentum", 0.0)),
        momentum2=float(last("momentum2", 0.999)),
        rms_decay=float(last("rms_decay", 0.99)),
        delta=float(last("delta", 1e-8)),
        weight_decay=float(last("weight_decay", 0.0)),
        regularization_type=str(last("regularization_type", "L2")),
        clip_gradients=float(last("clip_gradients", -1.0)),
        iter_size=int(last("iter_size", 1)),
    )
    if cfg.lr_policy == "step" and cfg.stepsize <= 0:
        # the reference would integer-divide by zero in GetLearningRate
        # (sgd_solver.cpp:37); fail loudly instead of inventing a default
        raise ValueError("lr_policy 'step' requires stepsize > 0 "
                         "(omitted stepsize reads as the proto default 0)")
    extras = {
        "max_iter": int(last("max_iter", 40001)),
        "test_interval": int(last("test_interval", 0)),  # proto default 0
        "snapshot": int(last("snapshot", 0)),
        "snapshot_prefix": last("snapshot_prefix"),
        "random_seed": last("random_seed"),
        "display": int(last("display", 50)),
    }
    return cfg, extras


def model_config_from_net_prototxt(text: str, **overrides):
    """A driver-generated net prototxt (network_v3/v4/v4_2/v5 family,
    do_trec_qa_clean.py:377-605) -> MMSQAConfig.

    Walks the layer list in order and reads the architecture back out:
    Embed (vocab/input_dim + embed dim), SimCross (dist_mode /
    mesure_count / bias_term), the conv->BN->pool->TanH blocks
    (kernel_h/w, num_output, pool AVE/MAX, pool kernel/stride), the two
    InnerProducts (fc1 width, class count) and the two dropouts.  The
    token lengths are data-shape facts not present in the prototxt --
    pass ``question_len``/``answer_len`` (or any other field) as
    overrides.  Raises for graphs outside the MMS family (this framework
    builds models from typed configs, not arbitrary DAGs -- PARITY.md's
    stated design stance)."""
    import dataclasses

    from ..models.mms_qa import ConvBlock, MMSQAConfig

    d = parse_prototxt(text)
    layers = d.get("layer", [])
    if isinstance(layers, dict):
        layers = [layers]
    if not layers:
        raise ValueError("no layer {} blocks found (V1 'layers' or "
                         "non-net prototxt?)")

    fields: dict = {}
    blocks = []
    current = None          # pending (kh, kw, out) awaiting its pool
    ip_dims = []
    saw_sim = False

    def one(v, default=None):
        if isinstance(v, list):
            return v[-1]
        return default if v is None else v

    for layer in layers:
        t = layer.get("type", "")
        if t == "Embed" and "embed" not in fields:
            ep = layer.get("embed_param", {})
            fields["embed_dim"] = int(one(ep.get("num_output"), 50))
            fields["vocab_size"] = int(one(ep.get("input_dim"), 100))
            fields["embed"] = True
        elif t == "SimCross":
            sp = layer.get("sim_cross_param", {})
            fields["sim_mode"] = int(one(sp.get("dist_mode"), 0))
            fields["sim_measures"] = int(one(sp.get("mesure_count"), 1))
            fields["sim_bias"] = bool(one(sp.get("bias_term"), False))
            saw_sim = True
        elif t == "Dropout":
            ratio = float(one(layer.get("dropout_param", {})
                              .get("dropout_ratio"), 0.5))
            if saw_sim and not blocks and current is None and not ip_dims:
                fields["sim_dropout"] = ratio
            elif ip_dims:
                fields["fc1_dropout"] = ratio
        elif t == "Convolution":
            cp = layer.get("convolution_param", {})
            current = (int(one(cp.get("kernel_h"), 1)),
                       int(one(cp.get("kernel_w"), 1)),
                       int(one(cp.get("num_output"))))
        elif t == "Pooling" and current is not None:
            pp = layer.get("pooling_param", {})
            pool = str(one(pp.get("pool"), "MAX")).lower()
            if pool in ("0", "1"):  # enum by number
                pool = "max" if pool == "0" else "ave"
            blocks.append(ConvBlock(current[0], current[1], current[2],
                                    pool,
                                    int(one(pp.get("kernel_h"), 1)),
                                    int(one(pp.get("stride_h"), 1))))
            current = None
        elif t == "InnerProduct":
            ip_dims.append(int(one(layer.get("inner_product_param", {})
                                   .get("num_output"))))
    if "embed" not in fields or not saw_sim or not blocks \
            or len(ip_dims) < 2:
        raise ValueError(
            "not an MMS-family net (need Embed + SimCross + conv blocks "
            "+ two InnerProducts); this framework instantiates models "
            "from typed configs, not arbitrary prototxt DAGs")
    fields.pop("embed")
    # a net with no Dropout layer has NO dropout -- never inherit the V4
    # defaults for a net that didn't declare them
    fields.setdefault("sim_dropout", 0.0)
    fields.setdefault("fc1_dropout", 0.0)
    cfg = MMSQAConfig(
        blocks=tuple(blocks), fc1_dim=ip_dims[0],
        num_classes=ip_dims[-1], **fields)
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    return cfg


def solver_prototxt_from_config(trainer_cfg, *, train_net="train.prototxt",
                                test_net=None) -> str:
    """TrainerConfig -> a solver.prototxt the reference can consume (the
    reverse of solver_config_from_prototxt; round-trips exactly)."""
    s = trainer_cfg.solver
    type_names = {"sgd": "SGD", "nesterov": "Nesterov",
                  "adagrad": "AdaGrad", "rmsprop": "RMSProp",
                  "adadelta": "AdaDelta", "adam": "Adam"}
    lines = [f'train_net: "{train_net}"']
    if test_net:
        lines += [f'test_net: "{test_net}"', "test_iter: 1"]
    lines += [
        f"test_interval: {trainer_cfg.test_interval}",
        f"base_lr: {s.base_lr}",
        f"display: {trainer_cfg.display}",
        f"max_iter: {trainer_cfg.max_iter}",
        f'lr_policy: "{s.lr_policy}"',
        # written unconditionally (inert for policies that ignore them)
        # so export -> ingest is the exact identity
        f"gamma: {s.gamma}",
        f"power: {s.power}",
        f"stepsize: {s.stepsize}",
    ]
    for v in s.stepvalues:
        lines.append(f"stepvalue: {v}")
    lines += [
        f"momentum: {s.momentum}",
        f"weight_decay: {s.weight_decay}",
        f'regularization_type: "{s.regularization_type}"',
        f"snapshot: {trainer_cfg.snapshot_interval}",
        f'snapshot_prefix: "{trainer_cfg.snapshot_prefix}"',
        f"random_seed: {trainer_cfg.seed}",
        f"delta: {s.delta}",
        f'type: "{type_names[s.solver_type]}"',
    ]
    if s.clip_gradients > 0:
        lines.append(f"clip_gradients: {s.clip_gradients}")
    if s.iter_size != 1:
        lines.append(f"iter_size: {s.iter_size}")
    if s.solver_type == "adam":
        lines.append(f"momentum2: {s.momentum2}")
    if s.solver_type == "rmsprop":
        lines.append(f"rms_decay: {s.rms_decay}")
    return "\n".join(lines) + "\n"


def net_prototxt_from_config(cfg, *, batch_size=50, source="train.txt",
                             phase="train") -> str:
    """MMSQAConfig -> a reference-loadable train-net prototxt in the
    driver's network_v* shape (do_trec_qa_clean.py:452-498): HDF5Data ->
    shared Embed pair -> SimCross -> [Dropout] -> conv/BN/pool/TanH
    blocks -> Flatten+Concat -> fc1 -> TanH -> [Dropout] -> fc2 ->
    SoftmaxWithLoss (+ the eval heads when phase='eval').  Round-trips
    through model_config_from_net_prototxt exactly (tested)."""
    L = []
    tops = ['top: "question" top: "answer" top: "label"']
    if phase == "eval":
        tops.append('top: "group"')
    tops.append('top: "overlap_feat"')
    shuffle = "true" if phase == "train" else "false"
    L.append(f'layer {{ name: "data" type: "HDF5Data" {" ".join(tops)}\n'
             f'  hdf5_data_param {{ source: "{source}" '
             f'batch_size: {batch_size} shuffle: {shuffle} }} }}')
    for nm, bottom in (("w2v_q", "question"), ("w2v_a", "answer")):
        L.append(
            f'layer {{ name: "{nm}" type: "Embed" bottom: "{bottom}" '
            f'top: "{nm}"\n'
            f'  param {{ name: "w2v-weights" lr_mult: 1 decay_mult: 0 }}\n'
            f'  param {{ name: "w2v-bias" lr_mult: 2 decay_mult: 0 }}\n'
            f'  embed_param {{ num_output: {cfg.embed_dim} '
            f'input_dim: {cfg.vocab_size}\n'
            f'    weight_filler {{ type: "uniform" '
            f'min: -{cfg.embed_init_range} max: {cfg.embed_init_range} }} '
            f'}} }}')
    bias = "true" if cfg.sim_bias else "false"
    L.append(
        'layer { name: "sim_cross" type: "SimCross" bottom: "w2v_q" '
        'bottom: "w2v_a" top: "sim_cross"\n'
        '  param { name: "embed-weights" decay_mult: 1 lr_mult: 1 }\n'
        f'  sim_cross_param {{ dist_mode: {cfg.sim_mode} '
        f'mesure_count: {cfg.sim_measures} bias_term: {bias} }} }}')
    prev = "sim_cross"
    if cfg.sim_dropout > 0:
        L.append(f'layer {{ name: "sim_drop" type: "Dropout" '
                 f'bottom: "{prev}" top: "sim_drop"\n'
                 f'  dropout_param {{ dropout_ratio: {cfg.sim_dropout} }} '
                 f'}}')
        prev = "sim_drop"
    for i, b in enumerate(cfg.blocks):
        L.append(
            f'layer {{ name: "conv{i}" type: "Convolution" '
            f'bottom: "{prev}" top: "conv{i}"\n'
            f'  param {{ name: "conv_{i}_w" lr_mult: 1 }}\n'
            f'  param {{ name: "conv_{i}_b" lr_mult: 2 decay_mult: 0 }}\n'
            f'  convolution_param {{ kernel_h: {b.kh} kernel_w: {b.kw} '
            f'stride: 1 num_output: {b.out_channels}\n'
            f'    weight_filler {{ type: "xavier" }} }} }}')
        L.append(
            f'layer {{ name: "bn{i}" type: "BN" bottom: "conv{i}" '
            f'top: "bn{i}"\n'
            # the driver pins the running-stat blobs at lr_mult 0
            # (do_trec_qa_clean.py:357-359) -- omitting these specs would
            # let a reference run solver-update the BN statistics
            f'  param {{ name: "bn_{i}_shape" lr_mult: 1 decay_mult: 0 }}\n'
            f'  param {{ name: "bn_{i}_shift" lr_mult: 1 decay_mult: 0 }}\n'
            f'  param {{ name: "bn_{i}_mean" lr_mult: 0 decay_mult: 0 }}\n'
            f'  param {{ name: "bn_{i}_variance" lr_mult: 0 '
            f'decay_mult: 0 }}\n'
            f'  bn_param {{ scale_filler {{ type: "constant" value: 1 }}\n'
            f'    shift_filler {{ type: "constant" '
            f'value: {cfg.bn_shift_init} }} }} }}')
        pool = "AVE" if b.pool == "ave" else "MAX"
        L.append(
            f'layer {{ name: "pool{i}" type: "Pooling" bottom: "bn{i}" '
            f'top: "pool{i}"\n'
            f'  pooling_param {{ pool: {pool} kernel_h: {b.pool_k} '
            f'kernel_w: {b.pool_k} stride_h: {b.pool_stride} '
            f'stride_w: {b.pool_stride} }} }}')
        L.append(f'layer {{ name: "relu{i}" type: "TanH" '
                 f'bottom: "pool{i}" top: "pool{i}" }}')
        prev = f"pool{i}"
    L.append(f'layer {{ name: "flt" type: "Flatten" bottom: "{prev}" '
             f'top: "flt" }}')
    L.append('layer { name: "feat" type: "Concat" bottom: "flt" '
             'bottom: "overlap_feat" top: "feat"\n'
             '  concat_param { concat_dim: 1 } }')
    L.append(
        f'layer {{ name: "fc1" type: "InnerProduct" bottom: "feat" '
        f'top: "fc1"\n'
        f'  param {{ name: "fc1-w" lr_mult: 1 decay_mult: 0 }}\n'
        f'  param {{ name: "fc1-b" lr_mult: 2 decay_mult: 0 }}\n'
        f'  inner_product_param {{ num_output: {cfg.fc1_dim}\n'
        f'    weight_filler {{ type: "xavier" }} }} }}')
    L.append('layer { name: "relu_fc1" type: "TanH" bottom: "fc1" '
             'top: "fc1" }')
    prev = "fc1"
    if cfg.fc1_dropout > 0:
        L.append(f'layer {{ name: "drop1" type: "Dropout" '
                 f'bottom: "{prev}" top: "{prev}"\n'
                 f'  dropout_param {{ dropout_ratio: {cfg.fc1_dropout} }} '
                 f'}}')
    L.append(
        f'layer {{ name: "fc2" type: "InnerProduct" bottom: "{prev}" '
        f'top: "fc2"\n'
        f'  param {{ name: "fc2-w" lr_mult: 1 decay_mult: 0 }}\n'
        f'  param {{ name: "fc2-b" lr_mult: 2 decay_mult: 0 }}\n'
        f'  inner_product_param {{ num_output: {cfg.num_classes}\n'
        f'    weight_filler {{ type: "xavier" }} }} }}')  # :438-440
    L.append('layer { name: "loss" type: "SoftmaxWithLoss" '
             'bottom: "fc2" bottom: "label" top: "loss" }')
    if phase == "eval":
        L.append('layer { name: "prob" type: "Softmax" bottom: "fc2" '
                 'top: "prob" }')
        L.append('layer { name: "mrr" type: "MRR" bottom: "prob" '
                 'bottom: "label" bottom: "group" top: "mrr" }')
        L.append('layer { name: "map" type: "MAP" bottom: "prob" '
                 'bottom: "label" bottom: "group" top: "map" }')
        L.append('layer { name: "auc" type: "AUC" bottom: "prob" '
                 'bottom: "label" top: "auc" }')
    return "\n".join(L) + "\n"


def trainer_config_from_prototxt(text: str, **overrides):
    """solver.prototxt -> TrainerConfig (our training-loop knobs driven by
    the reference's SolverParameter fields); keyword overrides win."""
    from ..training.trainer import TrainerConfig

    solver, ex = solver_config_from_prototxt(text)
    kwargs = dict(
        solver=solver,
        max_iter=ex["max_iter"],
        # 0 (the proto default) means "never test" in the reference
        # (TestAll gated on test_interval, solver.cpp:204-212) -- honored
        # by the trainer, not coerced to a house default
        test_interval=ex["test_interval"],
        snapshot_interval=ex["snapshot"],
        display=ex["display"],
    )
    if ex["random_seed"] is not None:
        kwargs["seed"] = int(ex["random_seed"])
    if ex["snapshot_prefix"]:
        import os
        kwargs["snapshot_prefix"] = os.path.basename(
            str(ex["snapshot_prefix"]))
    kwargs.update(overrides)
    return TrainerConfig(**kwargs)
