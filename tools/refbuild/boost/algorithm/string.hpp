// Minimal stand-in for the boost string algorithms used by the reference
// (trim_if, is_any_of, split with token_compress_on, to_upper_copy).
#ifndef SHIM_BOOST_ALGO_STRING_HPP
#define SHIM_BOOST_ALGO_STRING_HPP

#include <algorithm>
#include <cctype>
#include <string>
#include <vector>

namespace boost {

struct is_any_of_pred {
    std::string chars;
    bool operator()(char c) const { return chars.find(c) != std::string::npos; }
};

inline is_any_of_pred is_any_of(const std::string& chars) { return is_any_of_pred{chars}; }

template <typename Pred>
inline void trim_if(std::string& s, Pred pred) {
    std::size_t b = 0, e = s.size();
    while (b < e && pred(s[b])) b++;
    while (e > b && pred(s[e - 1])) e--;
    s = s.substr(b, e - b);
}

inline std::string to_upper_copy(const std::string& s) {
    std::string out = s;
    for (char& c : out) c = (char)std::toupper((unsigned char)c);
    return out;
}

namespace algorithm {

enum token_compress_mode_t { token_compress_off, token_compress_on };

template <typename Pred>
inline void split(std::vector<std::string>& out, const std::string& s, Pred pred,
                  token_compress_mode_t compress = token_compress_off) {
    out.clear();
    std::size_t i = 0;
    std::string cur;
    for (; i < s.size(); i++) {
        if (pred(s[i])) {
            if (compress == token_compress_on) {
                if (!cur.empty()) { out.push_back(cur); cur.clear(); }
            } else {
                out.push_back(cur);
                cur.clear();
            }
        } else {
            cur.push_back(s[i]);
        }
    }
    out.push_back(cur);
}

}  // namespace algorithm

using algorithm::split;
using algorithm::token_compress_on;

}  // namespace boost

#endif
