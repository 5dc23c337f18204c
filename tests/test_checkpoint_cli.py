"""Turnkey real-checkpoint path: local safetensors + tokenizer.json through
the CLI (VERDICT r3 #7).

Writes a tiny-random but exactly-HF-shaped export to disk — *.safetensors,
config.json, tokenizer.json — then drives `visual-rag-tpu checkpoint <dir>
--smoke-test`: config inference from config.json, conversion via
models/convert.py, weight validation, then embed -> index -> search with the
loaded weights. This is the exact command sequence a user runs the day real
ColSmol/ColPali/ColQwen snapshots are available (reference loads via
colpali-engine, visual_embedder.py:153-323).
"""

import json

import numpy as np
import pytest

from tests.test_convert import _exact_hf_state_dict, _tiny_for_layout
from visual_rag_tpu.cli.main import main as cli_main


def _write_tokenizer(path, image_token_id=500):
    from tokenizers import Tokenizer, models, pre_tokenizers

    words = ["what", "is", "the", "revenue", "table", "total", "report",
             "chart", "figure", "page", "a", "of", "in", "?"]
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3}
    vocab.update({w: 4 + i for i, w in enumerate(words)})
    vocab["<image>"] = image_token_id
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(str(path))


def _write_export(tmp_path, layout="idefics3"):
    """A tiny export with REAL HF key names + config.json + tokenizer.json."""
    from safetensors.numpy import save_file

    cfg = _tiny_for_layout(layout)
    sd, _ = _exact_hf_state_dict(layout, cfg)
    save_file(sd, str(tmp_path / "model.safetensors"))
    hf_cfg = {
        "model_type": "colidefics3",
        "image_token_id": cfg.image_token_id,
        "scale_factor": cfg.vision.pixel_shuffle,
        "text_config": {
            "hidden_size": cfg.text.hidden,
            "num_hidden_layers": cfg.text.layers,
            "num_attention_heads": cfg.text.heads,
            "num_key_value_heads": cfg.text.kv_heads,
            "intermediate_size": cfg.text.mlp_hidden,
            "vocab_size": cfg.text.vocab,
            "rope_theta": cfg.text.rope_theta,
        },
        "vision_config": {
            "hidden_size": cfg.vision.hidden,
            "num_hidden_layers": cfg.vision.layers,
            "num_attention_heads": cfg.vision.heads,
            "intermediate_size": int(cfg.vision.hidden * cfg.vision.mlp_ratio),
            "patch_size": 4,  # 3*4*4 == cfg.vision.patch_pixels (48)
        },
    }
    (tmp_path / "config.json").write_text(json.dumps(hf_cfg))
    _write_tokenizer(tmp_path / "tokenizer.json", cfg.image_token_id)
    return cfg


class TestConfigInference:
    def test_config_from_checkpoint_matches_tiny(self, tmp_path):
        from visual_rag_tpu.models.convert import (
            config_from_checkpoint,
            read_state_dict,
        )

        expect = _write_export(tmp_path)
        state = read_state_dict(str(tmp_path))
        cfg = config_from_checkpoint(str(tmp_path), "vidore/colSmol-500M",
                                     state_dict=state)
        assert cfg.text.hidden == expect.text.hidden
        assert cfg.text.layers == expect.text.layers
        assert cfg.text.kv_heads == expect.text.kv_heads
        assert cfg.text.vocab == expect.text.vocab
        assert cfg.vision.hidden == expect.vision.hidden
        assert cfg.vision.patch_pixels == 48
        assert cfg.vision.pixel_shuffle == expect.vision.pixel_shuffle
        assert cfg.image_token_id == expect.image_token_id
        # embed_dim comes from the projection tensor's actual shape
        assert cfg.embed_dim == expect.embed_dim

    def test_defaults_survive_missing_config_json(self, tmp_path):
        from safetensors.numpy import save_file

        from visual_rag_tpu.models.convert import config_from_checkpoint

        cfg0 = _tiny_for_layout("idefics3")
        sd, _ = _exact_hf_state_dict("idefics3", cfg0)
        save_file(sd, str(tmp_path / "model.safetensors"))
        cfg = config_from_checkpoint(str(tmp_path), "vidore/colSmol-500M")
        # no config.json -> backend defaults (full ColSmol shape)
        assert cfg.text.layers == 32
        assert cfg.vision.pixel_shuffle == 4


class TestCheckpointCLI:
    def test_report_only(self, tmp_path, capsys):
        _write_export(tmp_path)
        rc = cli_main(["checkpoint", str(tmp_path),
                       "--model", "vidore/colSmol-500M", "--json"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0, out
        assert out["ok"] is True
        assert out["missing"] == []
        assert out["shape_issues"] == []
        assert out["tensors_matched"] > 30

    def test_smoke_test_end_to_end(self, tmp_path, capsys):
        """Files on disk -> convert -> embed 3 pages -> seal -> search."""
        _write_export(tmp_path)
        rc = cli_main(["checkpoint", str(tmp_path),
                       "--model", "vidore/colSmol-500M",
                       "--smoke-test", "--json"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0, out
        assert out["smoke"]["pages_indexed"] == 3
        assert out["smoke"]["n_hits"] == 3
        assert out["smoke"]["ok"] is True

    def test_bad_checkpoint_fails_cleanly(self, tmp_path, capsys):
        from safetensors.numpy import save_file

        # valid config.json but truncated weights -> missing keys, rc=1
        _write_export(tmp_path)
        cfg = _tiny_for_layout("idefics3")
        sd, _ = _exact_hf_state_dict("idefics3", cfg)
        half = dict(list(sd.items())[: len(sd) // 2])
        save_file(half, str(tmp_path / "model.safetensors"))
        rc = cli_main(["checkpoint", str(tmp_path),
                       "--model", "vidore/colSmol-500M", "--json"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 1
        assert out["ok"] is False
        assert out["missing"]


class TestSearchWithCheckpoint:
    def test_process_and_search_use_checkpoint_weights(self, tmp_path, capsys):
        """The ordinary process/search commands accept --checkpoint and load
        the exported weights (embedding parity with a directly-constructed
        embedder proves the weights actually flow through)."""
        _write_export(tmp_path)
        from visual_rag_tpu.cli.main import _make_embedder, build_parser

        args = build_parser().parse_args(
            ["search", "q", "--model", "vidore/colSmol-500M",
             "--checkpoint", str(tmp_path)])
        emb = _make_embedder(args)
        q1 = emb.embed_query("what is the revenue table ?")
        # same files loaded directly
        from visual_rag_tpu.models.convert import (
            config_from_checkpoint,
            read_state_dict,
        )
        from visual_rag_tpu.models.embedder import VisualEmbedder

        state = read_state_dict(str(tmp_path))
        cfg = config_from_checkpoint(str(tmp_path), "vidore/colSmol-500M",
                                     state_dict=state)
        emb2 = VisualEmbedder("vidore/colSmol-500M", config=cfg,
                              checkpoint=str(tmp_path),
                              tokenizer_path=str(tmp_path))
        q2 = emb2.embed_query("what is the revenue table ?")
        np.testing.assert_allclose(q1, q2, rtol=0, atol=0)
        # and a REAL tokenizer was picked up from the checkpoint dir
        assert emb.tokenizer.token_to_id("revenue") is not None
