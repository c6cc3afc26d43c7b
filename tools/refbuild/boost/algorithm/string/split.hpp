#include "../string.hpp"
