#pragma once
#include <limits>
#include <string>
#include <vector>
