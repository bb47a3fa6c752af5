"""Convert a reference (torch/Lightning) checkpoint into framework params.

SURVEY §7.5 tooling: loads the torch state dict, initialises this
framework's variables from a config, fills every matchable leaf via the
rule table (streamingflow_tpu/utils/torch_convert.py machinery: conv/linear
transposition, GRU gate splitting, BN running stats), reports unmatched
keys on both sides, and saves the result with the checkpoint manager so
`evaluate.py --checkpoint` can consume it directly.

Usage:
    python tools/convert_checkpoint.py --torch-ckpt model.ckpt \
        --config-file configs/prediction_lc_ode_variable.yml \
        --rules my_rules.py --out /path/to/ckpt_dir

The rules file must define ``RULES: list[(flax_regex, torch_template,
kind)]`` — see utils/torch_convert.py Rule for the kinds.  Start from the
report's 'missing' list and the reference module tree
(streamingflow/models/streamingflow.py) to grow the table; the converter
refuses silently-wrong shapes.
"""
import argparse
import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--torch-ckpt', required=True)
    ap.add_argument('--config-file', required=True)
    ap.add_argument('--rules',
                    default=os.path.join(os.path.dirname(
                        os.path.abspath(__file__)),
                        'rules_prediction_lc_ode_variable.py'),
                    help='python file defining RULES (default: the bundled '
                         'flagship Prediction_LC_ODE_Variable table)')
    ap.add_argument('--out', required=True, help='output checkpoint dir')
    ap.add_argument('--lenient-shapes', action='store_true')
    args = ap.parse_args()

    from streamingflow_tpu.config import load_cfg
    from streamingflow_tpu.data import make_batch
    from streamingflow_tpu.training import trainer as TR
    from streamingflow_tpu.training.checkpoint import CheckpointManager
    from streamingflow_tpu.utils import torch_convert as TC

    spec = importlib.util.spec_from_file_location('ckpt_rules', args.rules)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rules = mod.RULES

    cfg = load_cfg(args.config_file)
    batch = {k: jnp.asarray(v) for k, v in
             make_batch(cfg, batch_size=1, n_points=2048).items()}
    state = TR.create_train_state(cfg, jax.random.PRNGKey(0), batch)

    sd = TC.strip_prefix(TC.load_torch_state_dict(args.torch_ckpt))
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    new_vars, report = TC.convert_variables(
        variables, sd, rules, strict_shapes=not args.lenient_shapes)

    state = state.replace(params=new_vars['params'],
                          batch_stats=new_vars.get('batch_stats',
                                                   state.batch_stats))
    ckpt = CheckpointManager(args.out)
    ckpt.save(0, state, cfg)

    summary = {k: len(v) for k, v in report.items()}
    print(json.dumps(summary))
    for k in ('missing', 'unused_torch'):
        for item in report[k][:40]:
            print(f'{k}: {item}')
        if len(report[k]) > 40:
            print(f'{k}: ... {len(report[k]) - 40} more')


if __name__ == '__main__':
    main()
