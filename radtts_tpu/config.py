"""Config system: JSON configs with 4 blocks (train/data/dist/model) and
dot-path CLI overrides.

Behavior parity with the reference CLI contract (reference: common.py:65-83,
train.py:458-498): `-p a.b.c=value` overrides are parsed with
`ast.literal_eval` and applied recursively; unknown keys print a notice and
are skipped.
"""

import ast
import json


def update_params(config, params):
    """Apply a list of 'dot.path=value' overrides to a nested dict config."""
    for param in params:
        print(param)
        k, v = param.split("=", 1)
        try:
            v = ast.literal_eval(v)
        except Exception:
            pass

        k_split = k.split(".")
        if len(k_split) > 1:
            parent_k = k_split[0]
            cur_param = [".".join(k_split[1:]) + "=" + str(v)]
            update_params(config[parent_k], cur_param)
        elif k in config and len(k_split) == 1:
            print(f"overriding {k} with {v}")
            config[k] = v
        else:
            print("{}, {} params not updated".format(k, v))


def load_config(path, overrides=()):
    """Load a JSON config file and apply dot-path overrides."""
    with open(path) as f:
        config = json.load(f)
    update_params(config, list(overrides))
    return config
