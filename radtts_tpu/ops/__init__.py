from radtts_tpu.ops.masking import sequence_mask
