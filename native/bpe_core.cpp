// Byte-level BPE encoder core — C++ fast path for mit_tpu.text.
//
// Replaces the Rust `tokenizers` crate's encode hot loop (the reference
// depends on it via tokenizer.py:173; Rust is unavailable in this
// environment, so the native path is C++ as per the build rules).
//
// Design: Python owns pre-tokenization (GPT-2 regex) and hands over each
// pre-token's RAW BYTES. The GPT-2 byte→unicode alphabet is a bijection, so
// BPE over unicode strings is isomorphic to BPE over raw byte strings —
// Python converts vocab tokens and merge pairs back to byte strings when
// constructing the handle, and this file never touches Unicode.
//
// C ABI (ctypes):
//   bpe_create(tokens_blob, merges_blob)  — blobs are length-prefixed entries
//   bpe_encode_words(handle, words_blob, n, out_ids, max_out) -> count
//   bpe_free(handle)
//
// Bit-identity with the Python reference implementation (and therefore with
// the HF library) is enforced by tests/test_native_bpe.py.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
    size_t operator()(const std::pair<std::string, std::string>& p) const {
        std::hash<std::string> h;
        return h(p.first) * 1000003u ^ h(p.second);
    }
};

struct BPE {
    std::unordered_map<std::string, int32_t> vocab;
    std::unordered_map<std::pair<std::string, std::string>, int32_t, PairHash>
        ranks;
    std::unordered_map<std::string, std::vector<int32_t>> cache;
    int32_t unk_id = -1;

    void encode_word(const char* data, uint32_t len,
                     std::vector<int32_t>& out) {
        std::string word(data, len);
        auto it = cache.find(word);
        if (it != cache.end()) {
            out.insert(out.end(), it->second.begin(), it->second.end());
            return;
        }
        // start from single bytes
        std::vector<std::string> parts;
        parts.reserve(len);
        for (uint32_t i = 0; i < len; i++) parts.emplace_back(1, data[i]);

        while (parts.size() >= 2) {
            int32_t best_rank = INT32_MAX;
            size_t best_i = SIZE_MAX;
            for (size_t i = 0; i + 1 < parts.size(); i++) {
                auto r = ranks.find({parts[i], parts[i + 1]});
                if (r != ranks.end() && r->second < best_rank) {
                    best_rank = r->second;
                    best_i = i;
                }
            }
            if (best_i == SIZE_MAX) break;
            // merge every occurrence of the best pair, left to right
            const std::string a = parts[best_i];
            const std::string b = parts[best_i + 1];
            std::vector<std::string> merged;
            merged.reserve(parts.size());
            for (size_t i = 0; i < parts.size();) {
                if (i + 1 < parts.size() && parts[i] == a && parts[i + 1] == b) {
                    merged.push_back(a + b);
                    i += 2;
                } else {
                    merged.push_back(parts[i]);
                    i += 1;
                }
            }
            parts.swap(merged);
        }

        std::vector<int32_t> ids;
        ids.reserve(parts.size());
        for (auto& p : parts) {
            auto v = vocab.find(p);
            if (v != vocab.end()) {
                ids.push_back(v->second);
            } else if (unk_id >= 0) {
                ids.push_back(unk_id);
            }
        }
        if (cache.size() < (1u << 16)) cache.emplace(std::move(word), ids);
        out.insert(out.end(), ids.begin(), ids.end());
    }
};

// blob format: repeated [uint32 len][bytes]
const char* read_entry(const char* p, std::string& out) {
    uint32_t len;
    std::memcpy(&len, p, 4);
    p += 4;
    out.assign(p, len);
    return p + len;
}

}  // namespace

extern "C" {

// tokens_blob: n_tokens entries of [len][token_bytes][int32 id]
// merges_blob: n_merges entries of [len][left_bytes][len][right_bytes]
void* bpe_create(const char* tokens_blob, int32_t n_tokens,
                 const char* merges_blob, int32_t n_merges, int32_t unk_id) {
    auto* bpe = new BPE();
    bpe->unk_id = unk_id;
    const char* p = tokens_blob;
    for (int32_t i = 0; i < n_tokens; i++) {
        std::string tok;
        p = read_entry(p, tok);
        int32_t id;
        std::memcpy(&id, p, 4);
        p += 4;
        bpe->vocab.emplace(std::move(tok), id);
    }
    p = merges_blob;
    for (int32_t i = 0; i < n_merges; i++) {
        std::string a, b;
        p = read_entry(p, a);
        p = read_entry(p, b);
        bpe->ranks.emplace(std::make_pair(std::move(a), std::move(b)), i);
    }
    return bpe;
}

// words_blob: n_words entries of [uint32 len][raw bytes]
// returns number of ids written (or -1 if out buffer too small)
int32_t bpe_encode_words(void* handle, const char* words_blob, int32_t n_words,
                         int32_t* out_ids, int32_t max_out) {
    auto* bpe = static_cast<BPE*>(handle);
    std::vector<int32_t> ids;
    const char* p = words_blob;
    for (int32_t i = 0; i < n_words; i++) {
        uint32_t len;
        std::memcpy(&len, p, 4);
        p += 4;
        bpe->encode_word(p, len, ids);
        p += len;
    }
    if (static_cast<int32_t>(ids.size()) > max_out) return -1;
    std::memcpy(out_ids, ids.data(), ids.size() * 4);
    return static_cast<int32_t>(ids.size());
}

void bpe_free(void* handle) { delete static_cast<BPE*>(handle); }

}  // extern "C"
