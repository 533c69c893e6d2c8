"""Round-trip: reference state_dict -> our params -> exported state_dict.

The export must reproduce the reference checkpoint exactly (same key set,
same tensors) and load into the reference model with strict=True, covering
all three attribute-model families."""

import copy

import numpy as np
import pytest
import torch

import jax

from tests.ref_utils import install_reference

install_reference()

from radtts import RADTTS as RefRADTTS  # noqa: E402

from radtts_tpu.convert import radtts_from_torch  # noqa: E402
from radtts_tpu.export import radtts_to_torch  # noqa: E402
from radtts_tpu.models.radtts import radtts_init  # noqa: E402
from tests.small_model import MODEL_CONFIG  # noqa: E402
from tests.test_attribute_models import (AGAP_HPARAMS,  # noqa: E402
                                         BGAP_HPARAMS)


def _roundtrip(model_config):
    torch.manual_seed(0)
    ref = RefRADTTS(**copy.deepcopy(model_config))
    sd = ref.state_dict()

    template = radtts_init(jax.random.PRNGKey(0), model_config)
    params = radtts_from_torch(sd, model_config, template)
    sd2 = radtts_to_torch(params)

    assert set(sd2) == set(sd), (
        sorted(set(sd) - set(sd2))[:5], sorted(set(sd2) - set(sd))[:5])
    for k in sd:
        np.testing.assert_allclose(
            sd2[k].numpy(), sd[k].float().numpy(), rtol=1e-6, atol=1e-7,
            err_msg=k)
        assert sd2[k].shape == sd[k].shape, k

    # the reference must accept it strictly
    ref.load_state_dict(sd2, strict=True)


@pytest.mark.slow
def test_export_roundtrip_dap():
    _roundtrip(MODEL_CONFIG)


def test_export_roundtrip_bgap_agap():
    mc = copy.deepcopy(MODEL_CONFIG)
    bgap = copy.deepcopy(BGAP_HPARAMS)
    bgap["bottleneck_hparams"]["in_dim"] = 64
    agap = copy.deepcopy(AGAP_HPARAMS)
    agap["bottleneck_hparams"]["in_dim"] = 64
    mc["f0_model_config"] = {"name": "bgap", "hparams": bgap}
    mc["energy_model_config"] = {"name": "agap", "hparams": agap}
    _roundtrip(mc)


def test_export_checkpoint_file(tmp_path):
    """Our randomly-initialized params must export to a checkpoint the
    reference loads strictly — i.e. our init shapes equal the reference's
    (incl. its hardcoded 1024-wide WN, common.py:750)."""
    from radtts_tpu.export import export_torch_checkpoint

    mc = copy.deepcopy(MODEL_CONFIG)
    # the reference cannot build narrow WN couplings; drop our override
    mc.pop("affine_n_channels", None)
    template = radtts_init(jax.random.PRNGKey(0), mc)
    path = tmp_path / "exported.pt"
    export_torch_checkpoint(str(path), template, iteration=123,
                            learning_rate=1e-4)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["iteration"] == 123
    torch.manual_seed(0)
    ref = RefRADTTS(**copy.deepcopy(mc))
    ref.load_state_dict(ckpt["state_dict"], strict=True)
