"""Shared reduced-size RADTTS config + batch builders for parity tests."""

import torch

DAP_CFG = {
    "name": "dap",
    "hparams": {
        "n_speaker_dim": 8,
        "bottleneck_hparams": {"in_dim": 64, "reduction_factor": 16,
                               "norm": "weightnorm", "non_linearity": "relu"},
        "take_log_of_input": True,
        "arch_hparams": {"out_dim": 1, "n_layers": 2, "n_channels": 16,
                         "kernel_size": 3, "p_dropout": 0.25},
    },
}
V_CFG = {
    "name": "dap",
    "hparams": {
        "n_speaker_dim": 8,
        "take_log_of_input": False,
        "bottleneck_hparams": {"in_dim": 64, "reduction_factor": 16,
                               "norm": "weightnorm", "non_linearity": "relu"},
        "arch_hparams": {"out_dim": 1, "n_layers": 2, "n_channels": 16,
                         "kernel_size": 3, "p_dropout": 0.5,
                         "lstm_type": "", "use_linear": 1},
    },
}
F0_CFG = {
    "name": "dap",
    "hparams": {
        "n_speaker_dim": 8,
        "bottleneck_hparams": {"in_dim": 64, "reduction_factor": 16,
                               "norm": "weightnorm", "non_linearity": "relu"},
        "take_log_of_input": False,
        "arch_hparams": {"out_dim": 1, "n_layers": 2, "n_channels": 16,
                         "kernel_size": 5, "p_dropout": 0.5},
    },
}

MODEL_CONFIG = {
    "n_speakers": 3,
    "n_speaker_dim": 8,
    "n_text": 185,
    "n_text_dim": 64,
    "n_flows": 4,
    "n_conv_layers_per_step": 2,
    "n_mel_channels": 20,
    "n_hidden": 32,
    "affine_n_channels": 32,  # our small-WN override; reference fixes 1024
    "mel_encoder_n_hidden": 32,
    "dummy_speaker_embedding": False,
    "n_early_size": 2,
    "n_early_every": 2,
    "n_group_size": 2,
    "affine_model": "wavenet",
    "include_modules": "decatndpmvpredapm",
    "scaling_fn": "tanh",
    "matrix_decomposition": "LUS",
    "learn_alignments": True,
    "use_speaker_emb_for_alignment": False,
    "attn_straight_through_estimator": True,
    "use_context_lstm": True,
    "context_lstm_norm": "spectral",
    "context_lstm_w_f0_and_energy": True,
    "text_encoder_lstm_norm": "spectral",
    "n_f0_dims": 1,
    "n_energy_avg_dims": 1,
    "use_first_order_features": False,
    "unvoiced_bias_activation": "relu",
    "decoder_use_partial_padding": True,
    "decoder_use_unvoiced_bias": True,
    "ap_pred_log_f0": True,
    "ap_use_unvoiced_bias": True,
    "ap_use_voiced_embeddings": True,
    "dur_model_config": DAP_CFG,
    "f0_model_config": F0_CFG,
    "energy_model_config": dict(F0_CFG),
    "v_model_config": V_CFG,
}

B, N, T = 2, 12, 32


def make_batch(seed=1):
    torch.manual_seed(seed)
    mel = torch.randn(B, MODEL_CONFIG["n_mel_channels"], T)
    speaker_ids = torch.tensor([0, 2])
    text = torch.randint(1, 180, (B, N))
    in_lens = torch.tensor([12, 8])
    out_lens = torch.tensor([32, 20])
    prior = torch.rand(B, T, N) * 0.5 + 0.25
    f0 = torch.rand(B, T) * 300 + 100
    voiced = (torch.rand(B, T) > 0.3).float()
    f0 = f0 * voiced
    energy = torch.rand(B, T)
    return dict(mel=mel, speaker_ids=speaker_ids, text=text, in_lens=in_lens,
                out_lens=out_lens, prior=prior, f0=f0, voiced=voiced,
                energy=energy)
