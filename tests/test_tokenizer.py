"""HF tokenizer integration: local tokenizer.json drives query/prompt text.

Replaces the reference's AutoProcessor tokenizer half (model_loader.py) with
a local-files-only fast tokenizer; special tokens filter by their real ids.
"""

import numpy as np
import pytest

from visual_rag_tpu.models.colvlm import ColVLMConfig
from visual_rag_tpu.models.embedder import VisualEmbedder
from visual_rag_tpu.models.tokenizer import HashTokenizer, HFTokenizer, load_tokenizer


@pytest.fixture(scope="module")
def tok_file(tmp_path_factory):
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    words = ["query", ":", "hello", "world", "budget", "report", "the",
             "describe", "image", ".", "allocation"]
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "<image>": 4}
    vocab.update({w: i + 5 for i, w in enumerate(words)})
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    tok.add_special_tokens(["<pad>", "<s>", "</s>", "<unk>", "<image>"])
    path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    tok.save(str(path))
    return str(path)


class TestHFTokenizer:
    def test_load_and_specials(self, tok_file):
        t = HFTokenizer(tok_file)
        assert t.token_to_id("<image>") == 4
        assert t.pad_id == 0
        ids = t.encode("hello world")
        assert all(i >= 5 for i in ids)  # real words, not specials
        mask = t.special_mask(np.array([0, 1, 4, 7]))
        assert mask.tolist() == [True, True, True, False]

    def test_batch_encode_pads(self, tok_file):
        t = HFTokenizer(tok_file)
        ids, mask = t.batch_encode(["hello", "hello world budget"])
        assert ids.shape == mask.shape and ids.shape[1] == 3
        assert mask[0].tolist() == [True, False, False]
        assert (ids[0, 1:] == t.pad_id).all()

    def test_dir_loading_and_missing(self, tok_file, tmp_path):
        import shutil

        d = tmp_path / "ckpt"
        d.mkdir()
        shutil.copy(tok_file, d / "tokenizer.json")
        assert HFTokenizer(str(d)).vocab == HFTokenizer(tok_file).vocab
        with pytest.raises(FileNotFoundError):
            HFTokenizer(str(tmp_path / "nope"))

    def test_load_tokenizer_fallback(self):
        t = load_tokenizer(None, vocab=1000)
        assert isinstance(t, HashTokenizer)
        assert t.special_mask(np.array([2, 9])).tolist() == [True, False]


class TestEmbedderWithRealTokenizer:
    def test_query_filtering_uses_real_special_ids(self, tok_file):
        emb = VisualEmbedder("vidore/colSmol-500M", config=ColVLMConfig.tiny(),
                             tokenizer_path=tok_file)
        assert emb.processor.image_token_id == 4  # from tokenizer, not cfg
        # "query : hello world" -> 4 word-level tokens, none special
        q = emb.embed_query("hello world")
        assert q.shape == (4, emb.cfg.embed_dim)
        # unknown words hit <unk> (special) and are filtered
        q2 = emb.embed_query("zzzz qqqq")
        assert q2.shape == (2, emb.cfg.embed_dim)  # only "query", ":" survive
        q3 = emb.embed_query("zzzz qqqq", include_special_tokens=True)
        assert q3.shape == (4, emb.cfg.embed_dim)

    def test_images_use_tokenizer_prompt(self, tok_file):
        emb = VisualEmbedder("vidore/colSmol-500M", config=ColVLMConfig.tiny(),
                             tokenizer_path=tok_file, batch_size=1)
        img = np.random.default_rng(0).random((200, 150, 3)).astype(np.float32)
        embs, infos = emb.embed_images([img], return_token_info=True)
        assert infos[0]["num_visual_tokens"] == 128
        assert np.isfinite(embs[0]).all()
