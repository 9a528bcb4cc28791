"""Shor's algorithm: factor 15 via quantum period finding."""

from rustqip_tpu.algos import factor, find_period


def main():
    print("period of 7 mod 15:", find_period(7, 15))
    print("factor(15):", factor(15))


if __name__ == "__main__":
    main()
