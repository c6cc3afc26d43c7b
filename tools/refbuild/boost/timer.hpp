// Minimal boost::timer stand-in (the reference links it but barely uses it).
#ifndef SHIM_BOOST_TIMER_HPP
#define SHIM_BOOST_TIMER_HPP

#include <ctime>

namespace boost {
class timer {
    std::clock_t start_;

  public:
    timer() : start_(std::clock()) {}
    void restart() { start_ = std::clock(); }
    double elapsed() const { return double(std::clock() - start_) / CLOCKS_PER_SEC; }
};
}  // namespace boost

#endif
