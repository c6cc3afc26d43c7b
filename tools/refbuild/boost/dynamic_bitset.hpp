// Minimal stand-in for boost::dynamic_bitset, providing only the API the
// reference sources use (ctor, resize, operator[], count). Used ONLY to
// compile the read-only reference at /root/reference for golden-output
// generation; not part of the haploconduct_tpu framework.
#ifndef SHIM_BOOST_DYNAMIC_BITSET_HPP
#define SHIM_BOOST_DYNAMIC_BITSET_HPP

#include <algorithm>
#include <cstddef>
#include <memory>  // transitively provided by real boost; sources rely on it
#include <vector>

namespace boost {

template <typename Block = unsigned long>
class dynamic_bitset {
    std::vector<bool> bits_;

  public:
    dynamic_bitset() {}
    explicit dynamic_bitset(std::size_t n, bool value = false) : bits_(n, value) {}

    void resize(std::size_t n, bool value = false) { bits_.resize(n, value); }
    std::size_t size() const { return bits_.size(); }

    std::vector<bool>::reference operator[](std::size_t i) { return bits_[i]; }
    bool operator[](std::size_t i) const { return bits_[i]; }

    std::size_t count() const {
        std::size_t c = 0;
        for (bool b : bits_) c += b;
        return c;
    }
};

}  // namespace boost

#endif
