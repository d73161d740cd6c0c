// clm_bpe — native BPE merge core for the CLIP tokenizer.
//
// The Python tokenizer (clip_lora_match_tpu/tokenizer/bpe.py) keeps exact
// CLIP semantics for cleaning + word splitting; the greedy lowest-rank merge
// loop — the hot path when tokenizing large cold corpora (40k-row index
// builds, ref:scripts/build_text_index.py) — runs here. Contract mirrors
// ClipTokenizer._bpe: the word arrives as a byte-alphabet string (one unicode
// codepoint per original byte), units are codepoints with "</w>" appended to
// the last, merges apply greedily by rank until none match.
//
// Plain C ABI for ctypes. Vocabulary and merge tables are passed in as raw
// UTF-8 arrays (Python owns the JSON parsing).
//
// Build: g++ -O3 -fPIC -shared -std=c++17 -o libclm_bpe.so clm_bpe.cpp

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct BpeModel {
  std::unordered_map<std::string, int32_t> vocab;
  std::unordered_map<std::string, int32_t> merge_rank;  // key: "a\x01b"
  int32_t unk_id = 0;
};

inline std::string merge_key(const std::string& a, const std::string& b) {
  std::string k;
  k.reserve(a.size() + b.size() + 1);
  k += a;
  k += '\x01';
  k += b;
  return k;
}

// Split a UTF-8 string into codepoint substrings.
std::vector<std::string> utf8_units(const char* s, int len) {
  std::vector<std::string> units;
  int i = 0;
  while (i < len) {
    unsigned char c = static_cast<unsigned char>(s[i]);
    int n = 1;
    if ((c & 0x80) == 0x00) n = 1;
    else if ((c & 0xE0) == 0xC0) n = 2;
    else if ((c & 0xF0) == 0xE0) n = 3;
    else if ((c & 0xF8) == 0xF0) n = 4;
    if (i + n > len) n = 1;  // malformed tail: treat byte-wise
    units.emplace_back(s + i, n);
    i += n;
  }
  return units;
}

}  // namespace

extern "C" {

void* clm_bpe_init(const char** tokens, const int32_t* token_lens,
                   const int32_t* token_ids, int32_t n_tokens,
                   const char** merge_a, const int32_t* merge_a_lens,
                   const char** merge_b, const int32_t* merge_b_lens,
                   int32_t n_merges, int32_t unk_id) {
  auto* m = new BpeModel();
  m->vocab.reserve(n_tokens * 2);
  for (int32_t i = 0; i < n_tokens; ++i) {
    m->vocab.emplace(std::string(tokens[i], token_lens[i]), token_ids[i]);
  }
  m->merge_rank.reserve(n_merges * 2);
  for (int32_t i = 0; i < n_merges; ++i) {
    m->merge_rank.emplace(
        merge_key(std::string(merge_a[i], merge_a_lens[i]),
                  std::string(merge_b[i], merge_b_lens[i])),
        i);
  }
  m->unk_id = unk_id;
  return m;
}

void clm_bpe_free(void* handle) { delete static_cast<BpeModel*>(handle); }

// Encode one byte-alphabet word (WITHOUT specials) into token ids.
// Returns the number of ids written (≤ max_out); -1 if out buffer too small.
int32_t clm_bpe_encode_word(void* handle, const char* word, int32_t word_len,
                            int32_t* out, int32_t max_out) {
  auto* m = static_cast<BpeModel*>(handle);
  std::vector<std::string> units = utf8_units(word, word_len);
  if (units.empty()) return 0;
  units.back() += "</w>";

  // greedy lowest-rank merging
  while (units.size() > 1) {
    int best_rank = INT32_MAX;
    size_t best_pos = 0;
    for (size_t i = 0; i + 1 < units.size(); ++i) {
      auto it = m->merge_rank.find(merge_key(units[i], units[i + 1]));
      if (it != m->merge_rank.end() && it->second < best_rank) {
        best_rank = it->second;
        best_pos = i;
      }
    }
    if (best_rank == INT32_MAX) break;
    // merge EVERY adjacent occurrence of this pair, left to right (matches
    // the reference algorithm's inner while loop)
    const std::string a = units[best_pos];
    const std::string b = units[best_pos + 1];
    std::vector<std::string> merged;
    merged.reserve(units.size());
    size_t i = 0;
    while (i < units.size()) {
      if (i + 1 < units.size() && units[i] == a && units[i + 1] == b) {
        merged.push_back(a + b);
        i += 2;
      } else {
        merged.push_back(units[i]);
        i += 1;
      }
    }
    units.swap(merged);
  }

  if (static_cast<int32_t>(units.size()) > max_out) return -1;
  int32_t n = 0;
  for (auto& u : units) {
    auto it = m->vocab.find(u);
    out[n++] = it == m->vocab.end() ? m->unk_id : it->second;
  }
  return n;
}

int32_t clm_bpe_version() { return 1; }

}  // extern "C"
