"""Config dataclass / argparse bridge tests."""

import argparse

from rel_pose_tpu.config import (
    ModelConfig, TrainConfig, add_model_flags, model_config_from_args,
)


class TestModelConfig:
    def test_regressor_dims_match_reference(self):
        # H values from /root/reference/src/model.py:61-74
        assert ModelConfig().regressor_input_dim == 26880
        assert ModelConfig(no_pos_encoding=True).regressor_input_dim == 24576
        assert ModelConfig(noess=True).regressor_input_dim == 576 * 43
        assert ModelConfig(
            fusion_transformer=False).regressor_input_dim == 60 * 576
        assert ModelConfig(fusion_transformer=False,
                           pool_size=30).regressor_input_dim == 30 * 576

    def test_pool_feat1(self):
        assert ModelConfig().pool_feat1 == 96          # min(96, 4*60)
        assert ModelConfig(pool_size=10).pool_feat1 == 40

    def test_constants(self):
        cfg = ModelConfig()
        assert cfg.num_patches == 576
        assert cfg.head_dim == 64
        assert cfg.feature_resolution == (24, 24)
        assert cfg.pose_size == 7


class TestArgparseBridge:
    def test_flags_round_trip(self):
        parser = argparse.ArgumentParser()
        add_model_flags(parser)
        args = parser.parse_args([
            "--fusion_transformer", "--transformer_depth", "4",
            "--cross_features", "--use_single_softmax",
            "--fc_hidden_size", "256", "--compute_dtype", "bfloat16"])
        cfg = model_config_from_args(args)
        assert cfg.fusion_transformer and cfg.cross_features
        assert cfg.use_single_softmax and not cfg.noess
        assert cfg.transformer_depth == 4
        assert cfg.fc_hidden_size == 256
        assert cfg.compute_dtype == "bfloat16"

    def test_defaults_match_reference(self):
        # reference defaults: train.py:241-249
        parser = argparse.ArgumentParser()
        add_model_flags(parser)
        args = parser.parse_args([])
        cfg = model_config_from_args(args)
        assert cfg.fc_hidden_size == 512
        assert cfg.pool_size == 60
        assert cfg.transformer_depth == 6
        assert not cfg.fusion_transformer  # store_true default False

    def test_train_config_defaults(self):
        tc = TrainConfig()
        assert (tc.w_tr, tc.w_rot) == (10.0, 10.0)
        assert tc.steps == 120000 and tc.warmup == 10000
        assert tc.lr == 5e-4 and tc.clip == 2.5
        assert tc.weight_decay == 1e-5
