// wordpiece — self-contained C++ WordPiece tokenizer (BERT-base-uncased
// compatible) for the offline ETL stage.
//
// The reference tokenizes with HF's Rust `tokenizers` through transformers
// (reference: data/extract_token.py:15,38-50: BertTokenizer, max_length 256,
// no special tokens, padding_mask = 1 - attention_mask). This implementation
// removes that dependency: basic-tokenize (lowercase, accent strip for
// Latin-1 supplement, punctuation split, CJK isolation) + greedy
// longest-match-first WordPiece against a vocab.txt.
//
// Exposed over ctypes (mla_tpu/data/wordpiece.py::WordPieceTokenizer).

#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
  std::unordered_map<std::string, int32_t> tok2id;
  int32_t unk = 100;  // [UNK] in bert-base-uncased
};

Vocab* g_vocab = nullptr;

// HF BasicTokenizer._clean_text drops NUL/U+FFFD and every category-C
// codepoint (Cc except \t\n\r, and Cf: soft hyphen, ZW(N)J/ZWSP, LRM/RLM,
// bidi embeddings, word joiner, invisible operators, BOM, interlinear
// annotation, Arabic letter mark, Mongolian vowel separator). Checked
// BEFORE IsPunct — several Cf ranges sit inside the U+2000 punct block.
bool IsControl(uint32_t cp) {
  if (cp == 0 || cp == 0xFFFD) return true;
  if (cp < 0x20) return cp != '\t' && cp != '\n' && cp != '\r';
  if (cp >= 0x7F && cp <= 0x9F) return true;  // DEL + C1 controls
  return cp == 0xAD || cp == 0x061C || cp == 0x180E || cp == 0xFEFF ||
         (cp >= 0x200B && cp <= 0x200F) || (cp >= 0x202A && cp <= 0x202E) ||
         (cp >= 0x2060 && cp <= 0x2064) || (cp >= 0x2066 && cp <= 0x206F) ||
         (cp >= 0xFFF9 && cp <= 0xFFFB);
}

bool IsPunct(uint32_t cp) {
  if ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
      (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126))
    return true;
  // Latin-1 category-P: ¡ § « ¶ · » ¿ (HF uses unicodedata category P*)
  if (cp == 0xA1 || cp == 0xA7 || cp == 0xAB || cp == 0xB6 || cp == 0xB7 ||
      cp == 0xBB || cp == 0xBF)
    return true;
  // fullwidth/halfwidth forms, category-P subset of FF00-FF65 (the Sc/Sm/Sk
  // symbols ＄＋＜＝＞＾｀｜～ are NOT punctuation in HF)
  if ((cp >= 0xFF01 && cp <= 0xFF03) || (cp >= 0xFF05 && cp <= 0xFF0A) ||
      (cp >= 0xFF0C && cp <= 0xFF0F) || cp == 0xFF1A || cp == 0xFF1B ||
      cp == 0xFF1F || cp == 0xFF20 || (cp >= 0xFF3B && cp <= 0xFF3D) ||
      cp == 0xFF3F || cp == 0xFF5B || cp == 0xFF5D ||
      (cp >= 0xFF5F && cp <= 0xFF65))
    return true;
  // general unicode punctuation blocks (approximate: a handful of
  // category-S codepoints inside 3004-303E are misclassified; no CJK
  // text exists in the reference's datasets)
  return (cp >= 0x2000 && cp <= 0x206F) || (cp >= 0x3000 && cp <= 0x303F);
}

bool IsCJK(uint32_t cp) {
  return (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
         (cp >= 0xF900 && cp <= 0xFAFF) ||
         (cp >= 0x20000 && cp <= 0x2A6DF) ||  // ext B
         (cp >= 0x2A700 && cp <= 0x2CEAF) ||  // ext C-E
         (cp >= 0x2F800 && cp <= 0x2FA1F);    // compat supplement
}

// decode one utf-8 codepoint; advances i
uint32_t NextCp(const std::string& s, size_t* i) {
  unsigned char c = s[*i];
  uint32_t cp = 0;
  int extra = 0;
  if (c < 0x80) {
    cp = c;
  } else if ((c >> 5) == 0x6) {
    cp = c & 0x1F;
    extra = 1;
  } else if ((c >> 4) == 0xE) {
    cp = c & 0x0F;
    extra = 2;
  } else {
    cp = c & 0x07;
    extra = 3;
  }
  ++*i;
  for (int k = 0; k < extra && *i < s.size(); ++k, ++*i)
    cp = (cp << 6) | (s[*i] & 0x3F);
  return cp;
}

void AppendCp(std::string* out, uint32_t cp) {
  if (cp < 0x80) {
    out->push_back((char)cp);
  } else if (cp < 0x800) {
    out->push_back((char)(0xC0 | (cp >> 6)));
    out->push_back((char)(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    out->push_back((char)(0xE0 | (cp >> 12)));
    out->push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back((char)(0x80 | (cp & 0x3F)));
  } else {
    out->push_back((char)(0xF0 | (cp >> 18)));
    out->push_back((char)(0x80 | ((cp >> 12) & 0x3F)));
    out->push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back((char)(0x80 | (cp & 0x3F)));
  }
}

// lowercase ASCII + strip common Latin-1 accents (uncased BERT behavior for
// the character ranges that matter in these datasets)
uint32_t Normalize(uint32_t cp) {
  if (cp >= 'A' && cp <= 'Z') return cp + 32;
  static const struct { uint32_t lo, hi; char base; } kAccents[] = {
      {0xC0, 0xC5, 'a'}, {0xC8, 0xCB, 'e'}, {0xCC, 0xCF, 'i'},
      {0xD2, 0xD6, 'o'}, {0xD9, 0xDC, 'u'}, {0xE0, 0xE5, 'a'},
      {0xE8, 0xEB, 'e'}, {0xEC, 0xEF, 'i'}, {0xF2, 0xF6, 'o'},
      {0xF9, 0xFC, 'u'}};
  for (auto& a : kAccents)
    if (cp >= a.lo && cp <= a.hi) return (uint32_t)a.base;
  if (cp == 0xC7 || cp == 0xE7) return 'c';
  if (cp == 0xD1 || cp == 0xF1) return 'n';
  return cp;
}

std::vector<std::string> BasicTokenize(const std::string& text) {
  std::vector<std::string> words;
  std::string cur;
  size_t i = 0;
  auto flush = [&] {
    if (!cur.empty()) {
      words.push_back(cur);
      cur.clear();
    }
  };
  while (i < text.size()) {
    uint32_t cp = Normalize(NextCp(text, &i));
    // HF BasicTokenizer treats every Unicode Zs as whitespace: NBSP,
    // en/em-family spaces (U+2000-U+200A), narrow NBSP, math space,
    // ideographic space. Without these, NBSP glues words together and the
    // U+2000 block falls into the punct range as standalone [UNK]s.
    bool zs = cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' ||
              cp == 0x00A0 || (cp >= 0x2000 && cp <= 0x200A) ||
              cp == 0x202F || cp == 0x205F || cp == 0x3000 || cp == 0x1680;
    if (zs) {
      flush();
    } else if (IsControl(cp)) {
      // dropped WITHOUT flushing: HF removes control chars before word
      // splitting, so "a<ZWSP>b" is one word "ab", not two
      continue;
    } else if (IsPunct(cp) || IsCJK(cp)) {
      flush();
      std::string p;
      AppendCp(&p, cp);
      words.push_back(p);
    } else {
      AppendCp(&cur, cp);
    }
  }
  flush();
  return words;
}

void WordpieceWord(const Vocab& v, const std::string& word,
                   std::vector<int32_t>* ids) {
  // HF's max_input_chars_per_word=100 counts CODEPOINTS, not bytes
  size_t nchars = 0;
  for (char c : word)
    if ((c & 0xC0) != 0x80) ++nchars;
  if (nchars > 100) {
    ids->push_back(v.unk);
    return;
  }
  size_t start = 0;
  std::vector<int32_t> pieces;
  while (start < word.size()) {
    size_t end = word.size();
    int32_t cur_id = -1;
    while (start < end) {
      std::string sub = word.substr(start, end - start);
      if (start > 0) sub = "##" + sub;
      auto it = v.tok2id.find(sub);
      if (it != v.tok2id.end()) {
        cur_id = it->second;
        break;
      }
      --end;
    }
    if (cur_id < 0) {
      ids->push_back(v.unk);
      return;
    }
    pieces.push_back(cur_id);
    start = end;
  }
  ids->insert(ids->end(), pieces.begin(), pieces.end());
}

}  // namespace

extern "C" {

int wp_load_vocab(const char* path) {
  std::ifstream f(path);
  if (!f.good()) return -1;
  auto* v = new Vocab();
  std::string line;
  int32_t id = 0;
  while (std::getline(f, line)) {
    while (!line.empty() && (line.back() == '\r' || line.back() == '\n'))
      line.pop_back();
    v->tok2id.emplace(line, id++);
  }
  auto it = v->tok2id.find("[UNK]");
  if (it != v->tok2id.end()) v->unk = it->second;
  delete g_vocab;
  g_vocab = v;
  return (int)v->tok2id.size();
}

// Tokenize text -> ids (no special tokens, extract_token.py:43-45 semantics).
// out_ids has capacity max_len; zero-padded. out_pm = 1 where padded.
// Returns the number of real tokens written (truncated at max_len).
int wp_encode(const char* text, int32_t* out_ids, float* out_pm, int max_len) {
  if (!g_vocab) return -1;
  std::vector<int32_t> ids;
  for (auto& w : BasicTokenize(text)) WordpieceWord(*g_vocab, w, &ids);
  int n = (int)std::min<size_t>(ids.size(), max_len);
  for (int i = 0; i < max_len; ++i) {
    out_ids[i] = i < n ? ids[i] : 0;
    out_pm[i] = i < n ? 0.0f : 1.0f;
  }
  return n;
}

}  // extern "C"
