import javax.sound.sampled.*;
import java.io.*;

public class WavProbe {
    public static void main(String[] args) throws Exception {
        AudioInputStream in = AudioSystem.getAudioInputStream(new File(args[0]));
        AudioFormat f = in.getFormat();
        byte[] data = in.readAllBytes();
        DataOutputStream out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(args[1])));
        out.write(data);
        out.close();
        System.out.println((int) f.getSampleRate() + " " + f.getChannels() + " "
            + f.getSampleSizeInBits() + " " + (f.isBigEndian() ? "BE" : "LE") + " " + data.length);
    }
}
