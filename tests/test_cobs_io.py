import numpy as np

from phylign_tpu.io import cobs
from phylign_tpu.kmer import canonical_kmers_ascii, cobs_row_indices, encode_seq


def make_docs(rng, n_docs=5, seq_len=300):
    docs = []
    for d in range(n_docs):
        seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), seq_len))
        docs.append((f"r{d:03d}_SAMEA{1000+d}", [seq]))
    return docs


class TestClassicIndexIO:
    def test_build_contains_all_doc_kmers(self):
        rng = np.random.default_rng(0)
        docs = make_docs(rng)
        idx = cobs.build_classic_index(docs, term_size=31)
        didx = cobs.to_device_index(idx)
        # every canonical kmer of doc d must set d's bit in its rows
        for d, (_, seqs) in enumerate(docs):
            rows = cobs_row_indices(
                encode_seq(seqs[0]), 31, idx.signature_size, idx.num_hashes
            )
            w, b = d // 32, d % 32
            for p in range(rows.shape[0]):
                for h in range(idx.num_hashes):
                    assert (didx.words[rows[p, h], w] >> b) & 1 == 1

    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        idx = cobs.build_classic_index(make_docs(rng), term_size=31, num_hashes=2)
        for suffix in ["bin", "xz"]:
            p = tmp_path / f"t.cobs_classic.{suffix}"
            cobs.write_classic_index(p, idx)
            back = cobs.read_classic_index(p)
            assert back.term_size == idx.term_size
            assert back.doc_names == idx.doc_names
            assert back.num_hashes == idx.num_hashes
            assert back.signature_size == idx.signature_size
            assert np.array_equal(back.rows, idx.rows)

    def test_device_repack_bit_semantics(self):
        # doc 0 -> byte0 bit0 -> word0 bit0; doc 9 -> byte1 bit1 -> word0 bit9
        rows = np.zeros((4, 2), dtype=np.uint8)
        rows[1, 0] = 0b00000001  # doc 0 in row 1
        rows[2, 1] = 0b00000010  # doc 9 in row 2
        idx = cobs.ClassicIndex(31, True, [f"d{i}" for i in range(10)], 1, 4, rows)
        didx = cobs.to_device_index(idx)
        assert didx.words.shape == (4, 1)
        assert (didx.words[1, 0] >> 0) & 1 == 1
        assert (didx.words[2, 0] >> 9) & 1 == 1
        assert didx.words[0, 0] == 0 and didx.words[3, 0] == 0

    def test_device_index_save_load(self, tmp_path):
        rng = np.random.default_rng(2)
        idx = cobs.build_classic_index(make_docs(rng, 3))
        didx = cobs.to_device_index(idx)
        cobs.save_device_index(tmp_path / "didx", didx)
        back = cobs.load_device_index(tmp_path / "didx")
        assert back.doc_names == didx.doc_names
        assert np.array_equal(np.asarray(back.words), didx.words)

    def test_strip_rid(self):
        assert cobs.strip_rid("0423_SAMEA12345") == "SAMEA12345"
        assert cobs.strip_rid("noprefix") == "noprefix"
