// Native WordPiece tokenizer (C++17, C ABI for ctypes).
//
// Host-side tokenization is the non-TPU hot path of offline index builds
// (500k+ entity descriptions per full ZeShEL run). This implements the
// BERT basic+wordpiece algorithm for ASCII inputs at C++ speed; any text
// containing non-ASCII bytes is reported back (return row flag) so the
// Python tokenizer (anncur_tpu/models/tokenizer.py) handles it with full
// Unicode semantics — guaranteeing byte-identical ids either way
// (tested in tests/test_native_tokenizer.py).
//
// C ABI:
//   void*  wp_create(const char** vocab_tokens, int n_tokens,
//                    int unk_id, int max_chars_per_word);
//   void   wp_destroy(void* handle);
//   int    wp_tokenize(void* handle, const char* text,
//                      int* out_ids, int max_out);
//          returns #ids written, or -1 if text needs the Python fallback
//          (non-ASCII), or -2 if out buffer too small.
//
// Build: g++ -O2 -shared -fPIC -std=c++17 -o libwordpiece.so wordpiece.cpp

#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
  std::unordered_map<std::string, int> token_to_id;
  int unk_id;
  int max_chars_per_word;
};

inline bool is_ascii(std::string_view s) {
  for (unsigned char c : s)
    if (c >= 0x80) return false;
  return true;
}

inline bool is_ws(char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
         c == '\f' || c == '\v';
}

inline bool is_ctrl(unsigned char c) {
  // ASCII control chars except \t \n \r (those are whitespace)
  return (c < 0x20 && c != '\t' && c != '\n' && c != '\r') || c == 0x7f;
}

inline bool is_punct(char c) {
  // mirrors the Python tokenizer's ASCII punctuation ranges
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
         (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}

// greedy longest-match-first wordpiece of one lowercase word
bool wordpiece(const Vocab& v, const std::string& word,
               std::vector<int>& out) {
  if ((int)word.size() > v.max_chars_per_word) {
    out.push_back(v.unk_id);
    return true;
  }
  size_t start = 0;
  std::vector<int> pieces;
  std::string buf;
  while (start < word.size()) {
    size_t end = word.size();
    int cur = -1;
    while (start < end) {
      buf.assign(start > 0 ? "##" : "");
      buf.append(word, start, end - start);
      auto it = v.token_to_id.find(buf);
      if (it != v.token_to_id.end()) {
        cur = it->second;
        break;
      }
      --end;
    }
    if (cur < 0) {
      out.push_back(v.unk_id);
      return true;
    }
    pieces.push_back(cur);
    start = end;
  }
  out.insert(out.end(), pieces.begin(), pieces.end());
  return true;
}

}  // namespace

extern "C" {

void* wp_create(const char** vocab_tokens, int n_tokens, int unk_id,
                int max_chars_per_word) {
  auto* v = new Vocab();
  v->unk_id = unk_id;
  v->max_chars_per_word = max_chars_per_word;
  v->token_to_id.reserve(n_tokens * 2);
  for (int i = 0; i < n_tokens; ++i) v->token_to_id.emplace(vocab_tokens[i], i);
  return v;
}

void wp_destroy(void* handle) { delete static_cast<Vocab*>(handle); }

int wp_tokenize(void* handle, const char* text, int* out_ids, int max_out) {
  const Vocab& v = *static_cast<Vocab*>(handle);
  std::string_view sv(text);
  if (!is_ascii(sv)) return -1;  // Python fallback handles Unicode

  std::vector<int> ids;
  ids.reserve(64);
  std::string word;
  word.reserve(32);

  auto flush_word = [&]() {
    if (!word.empty()) {
      wordpiece(v, word, ids);
      word.clear();
    }
  };

  for (char raw : sv) {
    unsigned char uc = static_cast<unsigned char>(raw);
    if (uc == 0 || is_ctrl(uc)) continue;  // _clean drops controls
    char c = raw;
    if (is_ws(c)) {
      flush_word();
      continue;
    }
    if (is_punct(c)) {
      flush_word();
      std::string p(1, c);
      wordpiece(v, p, ids);
      continue;
    }
    if (c >= 'A' && c <= 'Z') c = char(c - 'A' + 'a');  // lowercase
    word.push_back(c);
  }
  flush_word();

  if ((int)ids.size() > max_out) return -2;
  std::memcpy(out_ids, ids.data(), ids.size() * sizeof(int));
  return (int)ids.size();
}

}  // extern "C"
